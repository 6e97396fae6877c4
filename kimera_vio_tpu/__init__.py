"""kimera_vio_tpu — a TPU-native visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MIT-SPARK/Kimera-VIO: stereo/mono/RGB-D + IMU state estimation with a
fixed-lag smoothing backend, 3D mesher, and loop closure + pose-graph
optimization. See SURVEY.md at the repo root for the blueprint.
"""

__version__ = "0.1.0"

# TPU matmuls default to bfloat16 inputs; the geometric core (rotation
# chains, Jacobians, normal equations) needs true float32 accumulation.
# Hot image-processing matmuls opt back down with an explicit
# `precision=` / `preferred_element_type=` at the call site.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Honor JAX_COMPILATION_CACHE_DIR even when a site customization
# initializes jax config before env parsing (observed on remote-TPU
# hosts: the env var silently yields cache_dir=None, so every fresh
# process re-pays minutes of step-program compiles). Persisting compiled
# programs is load-bearing for this framework's startup latency.
import os as _os

_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
