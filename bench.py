"""Benchmark: clouds/sec/chip for the full DH3D forward (local backbone +
detector + global NetVLAD descriptor) at 8192 points — the BASELINE.json
metric.

Measurement notes: on the axon TPU tunnel `block_until_ready` returns before
execution completes and a host readback costs ~30 ms round-trip, so we
amortize: run the forward many times sequentially (data dependence through a
carried scalar prevents CSE/overlap-elision), then force one scalar
readback and divide.

The CUDA reference publishes no throughput numbers (BASELINE.json
`published` == {}), so `vs_baseline` is reported against the north-star
target derived there: >=5x an estimated 20 clouds/s for the TF1/CUDA
reference at batch 20 x 8192 pts on its era GPU — i.e. vs_baseline =
value / 100.  (BASELINE.md:25.)
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dh3d_tpu import config as cfglib
    from dh3d_tpu.nn import DH3D

    B, N, ITERS = 20, 8192, 30

    cfg = cfglib.get_config("global_config")
    cfg.num_points = N
    cfg.detection = True
    cfg.detection_block = "detection_block"
    model = DH3D(cfg)

    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 30.0)
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(0), points
    )

    @jax.jit
    def fwd_scalar(variables, points, salt):
        # salt creates a data dependence between iterations so sequential
        # calls cannot be elided or reordered.
        outs = model.apply(variables, points + salt * 1e-12, train=False)
        return (
            jnp.sum(outs["local_desc"][:, 0, 0])
            + jnp.sum(outs["global_desc"][:, 0])
            + jnp.sum(outs["attention"][:, 0, 0])
        )

    # warmup + compile
    salt = fwd_scalar(variables, points, jnp.float32(0))
    float(salt)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        salt = fwd_scalar(variables, points, salt)
    total = float(salt)  # forces completion of the whole chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(total)

    clouds_per_sec = B * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "clouds/sec/chip, full DH3D fwd (local+det+global) @ 8192 pts",
                "value": round(clouds_per_sec, 1),
                "unit": "clouds/s",
                "vs_baseline": round(clouds_per_sec / 100.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
