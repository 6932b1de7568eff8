"""Post-processing and verification CLIs (reference: pyro/analysis/)."""
