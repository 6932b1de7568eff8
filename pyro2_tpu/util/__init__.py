"""Runtime services: configuration, I/O, profiling, comparison, messaging."""
