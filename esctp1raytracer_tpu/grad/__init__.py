from esctp1raytracer_tpu.grad.optimize import OptimizeResult, fit_scene, adam_init, adam_update

__all__ = ["OptimizeResult", "fit_scene", "adam_init", "adam_update"]
