"""TPU validation of the sharded Pallas path: on a 1-device TPU mesh the
spatial program (shard_map + per-shard banded kernels selected by
axis_index) must compile and match the single-chip fused path bit-exactly.
Run:  python examples/tpu_spatial_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                               SourceDescriptor)
from videorenderer_tpu.config import Upscaling
from videorenderer_tpu.csputils import CSP, Levels, Primaries, TRC
from videorenderer_tpu.parallel.spatial import (make_spatial_frame_fn,
                                                shard_planes_rows)
from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline


def fetch(x):
    return np.asarray(x)


def main():
    print("backend:", jax.default_backend(), flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("spatial",))
    w, h = 3840, 2160
    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, levels=Levels.TV,
                           primaries=Primaries.BT_2020, transfer=TRC.PQ)
    dst = OutputDescriptor(width=1920, height=1080, bits=10)
    st = Settings(upscaling=Upscaling.LANCZOS3, convert_to_sdr=True)
    plan = plan_pipeline(st, src, dst)

    rng = np.random.default_rng(0)
    planes = (rng.integers(64, 941, (h, w), np.uint16) << 6,
              rng.integers(64, 961, (h // 2, w // 2), np.uint16) << 6,
              rng.integers(64, 961, (h // 2, w // 2), np.uint16) << 6)

    t0 = time.time()
    ref = fetch(jax.jit(make_frame_fn(plan))(planes))
    print(f"fused ref done in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    sp = jax.jit(make_spatial_frame_fn(plan, mesh))(
        shard_planes_rows(mesh, tuple(jnp.asarray(p) for p in planes)))
    got = fetch(sp)
    print(f"spatial done in {time.time()-t0:.1f}s", flush=True)
    exact = np.array_equal(got, ref)
    print("bit-exact:", exact, "| max diff:", np.abs(got - ref).max())

    # throughput of the spatial program on one chip (batch via loop of 8)
    bfn = jax.jit(make_spatial_frame_fn(plan, mesh))
    shp = shard_planes_rows(mesh, tuple(jnp.asarray(p) for p in planes))
    o = bfn(shp)
    np.asarray(o[0, :1, :1])  # sync
    n_it = 32
    t0 = time.time()
    for _ in range(n_it):
        o = bfn(shp)
    np.asarray(o[0, :1, :1])
    dt = time.time() - t0
    print(f"spatial 1-chip: {n_it/dt:.1f} f/s (fused headline path batches; "
          "this is the unbatched per-frame sharded program)")
    if not exact:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
