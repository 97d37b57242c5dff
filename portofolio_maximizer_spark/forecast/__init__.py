from .models import ar_grid_forecast, ewma_vol_forecast, ssa_reconstruct

__all__ = ["ar_grid_forecast", "ewma_vol_forecast", "ssa_reconstruct"]
