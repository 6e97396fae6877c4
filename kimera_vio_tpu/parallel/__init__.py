"""Multi-chip parallelism: fleet-VIO serving over a jax.sharding.Mesh."""

from kimera_vio_tpu.parallel.fleet import FleetVio  # noqa: F401
