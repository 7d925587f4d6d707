"""Population-scale batched reconstruction benchmark (BASELINE config 5:
'batched sampling across an injected-SNR grid on a v5p slice').

One jitted DDIM scan reconstructs a whole population at once; prints
samples/sec and denoise steps/sec/chip for the batched sampler.  With more
chips, `reconstruct_batch(mesh=...)` shards the same program over the mesh.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(B: int = 256, L: int = 4096, steps: int = 100):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        UNet1D,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig,
        ddim_sample,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
        make_schedule,
    )

    in_ch, cond_in_ch = 7, 5
    model = UNet1D(in_ch=in_ch, base_ch=64, time_dim=128, depth=3,
                   t_embed_max_time=999.0, cond_in_ch=cond_in_ch,
                   use_selfcond=True, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, in_ch, L)), jnp.zeros((1,), jnp.int32))
    schedule = make_schedule(1000, "cosine")
    # an injected-SNR grid population: same measurement template at B
    # different conditioning scales (shape-realistic; values arbitrary)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, cond_in_ch, L),
                             jnp.float32)
    cfg = SamplerConfig(steps=steps, cfg_scale=1.5, use_selfcond=True)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    run = jax.jit(lambda c, k: ddim_sample(model_fn, params, schedule, c, k, cfg))
    # fetch-forced sync: on the tunneled axon backend block_until_ready can
    # return before execution — only a host fetch forces it (see bench.py)
    _ = np.asarray(run(cond, jax.random.PRNGKey(2))[0, 0, :2])   # compile

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        _ = np.asarray(run(cond, jax.random.PRNGKey(3 + r))[0, 0, :2])
    dt = (time.perf_counter() - t0) / reps

    # CFG doubles the forwards per step
    denoise_steps = B * steps
    print(json.dumps({
        "metric": "population_ddim",
        "batch": B, "steps": steps, "L": L,
        "wall_s_per_population": round(dt, 3),
        "samples_per_sec": round(B / dt, 2),
        "denoise_steps_per_sec_per_chip": round(denoise_steps / dt, 1),
        "note": "cfg=1.5 -> 2 model forwards per denoise step",
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 1 else ())
