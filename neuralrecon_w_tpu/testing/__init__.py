from .probe import embedding_gain_correlation, injected_gains
from .synthetic import make_synthetic_scene, sphere_sdf

__all__ = [
    "embedding_gain_correlation",
    "injected_gains",
    "make_synthetic_scene",
    "sphere_sdf",
]
