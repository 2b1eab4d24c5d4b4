from . import derivs, extrap, moments, numerics, ops, segment, solve, state
from .state import Hist, HistMeta, make_hist, to_host

__all__ = [
    "Hist",
    "HistMeta",
    "make_hist",
    "to_host",
    "derivs",
    "extrap",
    "moments",
    "numerics",
    "ops",
    "segment",
    "solve",
    "state",
]
