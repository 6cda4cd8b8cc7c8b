"""long-vita-tpu: TPU-native Long-VITA framework (JAX/XLA/Pallas)."""
__version__ = "0.1.0"
