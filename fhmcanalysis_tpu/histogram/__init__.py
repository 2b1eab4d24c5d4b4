from . import collect, ntot

__all__ = ["collect", "ntot"]
