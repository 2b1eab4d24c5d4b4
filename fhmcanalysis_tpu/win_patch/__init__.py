from . import fhmc_equil, fhmc_patch, windows

__all__ = ["fhmc_equil", "fhmc_patch", "windows"]
