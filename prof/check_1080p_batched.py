"""Compile-only HBM check: the 1080p batched chunk program with the r5
hoisted-transpose buffers.

The bank-layout fix scans over (feats, feats_t) — at 1080p B=2 that is an
extra ~265 MB per chunk next to the 1.5 GB bank, and the r4 HBM lane
envelope (_hbm_lanes_cap) was calibrated before feats_t existed. This
lowers + compiles the B=2 1080p chunk program and prints the compiler's
memory analysis; RESOURCE_EXHAUSTED or argument+temp near the 16 GB HBM
would mean the envelope needs retightening.
"""
import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
from semi_supervised_vos_tpu.infer.engine import EngineConfig
from semi_supervised_vos_tpu.models.vos_net import VOSNet

H, W, B, CHUNK = 1080, 1920, 2, 8

net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()
eng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

fr = jax.ShapeDtypeStruct((CHUNK, B, H, W, 3), jnp.uint8)
st = jax.eval_shape(eng.init_state)
idx = jax.ShapeDtypeStruct((), jnp.int32)
ep = jax.eval_shape(lambda: eng.enc_params)

compiled = jax.jit(eng._step_chunk_small_impl, donate_argnums=(2,)).lower(
    ep, fr, st, idx
).compile()
mem = compiled.memory_analysis()
total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
         + mem.output_size_in_bytes - mem.alias_size_in_bytes)
print(
    f"1080p B={B} chunk program: temp {mem.temp_size_in_bytes/1e9:.2f} GB | "
    f"args {mem.argument_size_in_bytes/1e9:.2f} GB | "
    f"out {mem.output_size_in_bytes/1e9:.2f} GB | "
    f"alias {mem.alias_size_in_bytes/1e9:.2f} GB | "
    f"peak-ish total {total/1e9:.2f} GB (HBM ~16)"
)
