from .models import (
    ar_candidate_fits,
    ar_grid_forecast,
    ar_grid_forecast_fanout,
    arima_hr_forecast,
    arima_hr_warmstart_forecast,
    ewma_vol_forecast,
    garch11_fit,
    garch_grid_fit,
    samossa_forecast,
    sarimax_hr_forecast,
    ssa_reconstruct,
    walkforward_refit,
)

__all__ = [
    "ar_candidate_fits",
    "ar_grid_forecast",
    "ar_grid_forecast_fanout",
    "arima_hr_forecast",
    "arima_hr_warmstart_forecast",
    "ewma_vol_forecast",
    "garch11_fit",
    "garch_grid_fit",
    "samossa_forecast",
    "sarimax_hr_forecast",
    "ssa_reconstruct",
    "walkforward_refit",
]
