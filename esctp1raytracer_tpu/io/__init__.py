from esctp1raytracer_tpu.io.ppm import write_ppm, read_ppm

__all__ = ["write_ppm", "read_ppm"]
