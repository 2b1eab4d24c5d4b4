from . import free_energy_profile, imaging, organize
from .joint_hist import joint_hist
from .pore_hist import pore_hist

__all__ = ["joint_hist", "pore_hist", "free_energy_profile", "imaging", "organize"]
