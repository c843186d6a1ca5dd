"""Utility subpackage: pytree registration, image IO, profiling."""
