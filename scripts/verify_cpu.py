import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Fast CPU surface drive of the stereo pipeline on MicroEuroc (the /verify
recipe): ~30 frames, sequential mode, asserts sane outputs."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

params = VioParams.from_folder("/root/reference/params/Euroc")
params.max_features = 256
params.max_landmarks = 384
provider = EurocDataProvider(
    "/root/reference/tests/data/MicroEurocDataset", initial_k=10, final_k=40
)
pipe = StereoImuPipeline(params, output_path="/tmp/vio_out", parallel_run=False)
out = pipe.run(provider, verbose=True)
print("frames", out.n_frames, "keyframes", out.n_keyframes)
p = np.stack(out.positions)
print("max |pos|:", float(np.abs(p).max()))
with open("/tmp/vio_out/traj_vio.csv") as f:
    hdr = f.readline().strip().split(",")
print("traj csv cols:", len(hdr))
assert out.n_frames >= 25 and out.n_keyframes >= 2
assert np.abs(p).max() < 0.5, "trajectory exploded"
assert len(hdr) == 17
print("VERIFY CPU DRIVE OK")
