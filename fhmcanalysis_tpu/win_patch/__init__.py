from . import chkpt_equil, chkpt_patch, feasst_equil, feasst_patch, fhmc_equil, fhmc_patch, windows

__all__ = ["fhmc_equil", "fhmc_patch", "chkpt_equil", "chkpt_patch", "feasst_equil", "feasst_patch", "windows"]
