"""saber_ray: Ray-Data-native KG-construction engine (BaderLab/saber capabilities)."""
__version__ = "0.1.0"
