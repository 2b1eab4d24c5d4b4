from .isopleth import check_gibbs_duhem, combine_isopleth_grids, get_iso, isopleth, parameterize_mesh

__all__ = ["isopleth", "get_iso", "check_gibbs_duhem", "parameterize_mesh", "combine_isopleth_grids"]
