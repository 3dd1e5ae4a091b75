from .adaptive_pool import adaptive_avg_pool2d, adaptive_pool_matrix

__all__ = ["adaptive_avg_pool2d", "adaptive_pool_matrix"]
