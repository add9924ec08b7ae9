from spark_validate.functions.mathstats import (
    chi2_sf,
    gaussian_kde_at,
    hellinger_from_probs,
    js_distance_from_probs,
    psi_from_probs,
)

__all__ = [
    "chi2_sf",
    "gaussian_kde_at",
    "hellinger_from_probs",
    "js_distance_from_probs",
    "psi_from_probs",
]
