"""crdr_tpu: a TPU-native (JAX/XLA/Pallas) rate-distortion-realism image codec framework.

Re-implements the full capability surface of the CRDR reference (WACV 2024,
"Controlling Rate, Distortion, and Realism") as an idiomatic JAX framework:
NHWC conv transforms jit-compiled for the MXU, device-side entropy-parameter
computation, and a host-side C++ rANS coder for actual bitstreams.
"""

__version__ = "0.1.0"
