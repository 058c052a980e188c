"""Facade mirroring reference ``orphics.algorithms``."""
from .ops.algorithms import vectorized_bisection_search
