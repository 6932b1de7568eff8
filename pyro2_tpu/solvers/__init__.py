"""Solver packages (the reference's top-level solver directories)."""
