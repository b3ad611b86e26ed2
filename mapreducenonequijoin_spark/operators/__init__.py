from .joins import (
    asof_join,
    band_join,
    interval_overlap_join,
    inequality_join,
    naive_theta_join,
    salted_equi_join,
    theta_join,
)

__all__ = [
    "asof_join",
    "band_join",
    "interval_overlap_join",
    "inequality_join",
    "naive_theta_join",
    "salted_equi_join",
    "theta_join",
]
