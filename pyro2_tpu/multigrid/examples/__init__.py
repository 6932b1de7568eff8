"""Standalone multigrid verification scripts, doubling as regression
tests (reference: pyro/multigrid/examples/)."""
