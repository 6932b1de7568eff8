"""Lagrangian tracer particles (reference: pyro/particles/)."""

from pyro2_tpu.particles.particles import Particles
