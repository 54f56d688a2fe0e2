"""VideoHDR training: self-supervised inverse tone mapping.

The reference's "RTX Video HDR" slot is an opaque driver network
(Source/D3D11VP.cpp:846-891); a standalone framework ships its own
weights.  The objective here is *round-trip consistency against the
framework's own tone mapper*: synthesize HDR scenes in linear nits,
tone-map them to SDR with the pipeline's BT.2390 EETF + gamma encode
(exactly what a mastering chain producing SDR from HDR graded content
does), and train the gain net to recover the original HDR from that SDR.
The loss lives in PQ space (perceptually uniform, the net's output
domain).

 * :func:`synth_hdr_frames` — procedural HDR content: diffuse SDR-range
   base (reuses the SR data generator) plus specular highlights, emissive
   glyphs and bright sky gradients up to the mastering peak.  Inverse
   tone mapping is entirely about highlight reconstruction; the
   distribution concentrates there.
 * :func:`degrade_to_sdr` — HDR nits -> SDR sRGB via `ops.tonemap.bt2390`
   + `transfer.linear_to_srgb_like` (the pipeline's own math).
 * :func:`train` — optax Adam with f32 master weights, optional DP mesh
   (batch sharded, params replicated), same layout as `sr_train.train`.
 * :func:`evaluate_pq_psnr` — PQ-domain PSNR of the net vs the
   deterministic inverse-Reinhard base; the shipped checkpoint must BEAT
   the base (tests/test_hdr_train.py gates a reduced config,
   tests/test_hdr_checkpoint.py gates the shipped weights).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import csputils
from ..ops import tonemap, transfer
from .sr_train import synth_frames
from .videohdr import VideoHDRConfig, apply_fn, init_params


# ---------------------------------------------------------------- data

def synth_hdr_frames(seed: int, n: int, size: int,
                     cfg: VideoHDRConfig = VideoHDRConfig()) -> np.ndarray:
    """(n, size, size, 3) float32 linear-light frames in BT.709 primaries,
    absolute nits in [0, cfg.peak_nits].  Diffuse content sits in the SDR
    range (<= cfg.sdr_nits); highlights reach the peak."""
    rng = np.random.default_rng(seed)
    base = synth_frames(seed=seed + 1, n=n, size=size)       # [0,1] diffuse
    out = base * cfg.sdr_nits
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        kind = rng.integers(0, 3)
        if kind == 0:      # specular highlights: small bright gaussians
            for _ in range(rng.integers(2, 7)):
                cx, cy = rng.uniform(0, 1, 2)
                sig = rng.uniform(0.01, 0.08)
                amp = rng.uniform(0.3, 1.0) * cfg.peak_nits
                g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig * sig))
                tint = rng.uniform(0.7, 1.0, 3)
                out[i] += amp * g[..., None] * tint
        elif kind == 1:    # bright sky band (smooth vertical gradient)
            top = rng.uniform(0.3, 1.0) * cfg.peak_nits
            frac = rng.uniform(0.2, 0.6)
            band = np.clip(1.0 - yy / frac, 0.0, 1.0) ** 2
            tint = rng.uniform(0.8, 1.0, 3)
            out[i] += top * band[..., None] * tint
        else:              # emissive rectangles (signage/OSD-like)
            for _ in range(rng.integers(2, 8)):
                w = int(rng.integers(2, size // 4))
                h = int(rng.integers(2, size // 4))
                x0 = int(rng.integers(0, size - w))
                y0 = int(rng.integers(0, size - h))
                out[i, y0:y0 + h, x0:x0 + w] += \
                    rng.uniform(0.2, 1.0, 3) * cfg.peak_nits
    return np.clip(out, 0.0, cfg.peak_nits).astype(np.float32)


def degrade_to_sdr(hdr_nits: np.ndarray,
                   cfg: VideoHDRConfig = VideoHDRConfig()) -> np.ndarray:
    """HDR linear nits -> SDR sRGB [0,1] through the framework's own
    BT.2390 EETF (hue-preserving roll-off to the SDR white level) and
    gamma encode — the same math the pipeline's HDR->SDR path runs."""
    p = tonemap.HDRParams(mastering_max_nits=cfg.peak_nits,
                          max_cll=cfg.peak_nits,
                          display_max_nits=cfg.sdr_nits)
    sdr_nits = np.asarray(tonemap.bt2390(jnp.asarray(hdr_nits), p, axis=-1))
    lin = np.clip(sdr_nits / cfg.sdr_nits, 0.0, 1.0)
    return np.asarray(transfer.linear_to_srgb_like(jnp.asarray(lin)),
                      np.float32)


def hdr_truth_pq(hdr_nits: np.ndarray,
                 cfg: VideoHDRConfig = VideoHDRConfig()) -> np.ndarray:
    """Ground-truth PQ/BT.2020 encoding of BT.709-primaries linear nits
    (the net's output domain, matching `videohdr.inverse_tonemap_base`)."""
    gm = np.asarray(csputils.gamut_conversion_matrix(
        csputils.Primaries.BT_709, csputils.Primaries.BT_2020), np.float32)
    x = np.maximum(hdr_nits @ gm.T, 0.0)
    return np.asarray(transfer.linear_to_st2084(jnp.asarray(x), 10000.0),
                      np.float32)


# ---------------------------------------------------------------- training

def loss_fn(params, sdr, pq_truth, cfg: VideoHDRConfig = VideoHDRConfig()):
    """Charbonnier in PQ space (the output/perceptual domain)."""
    pred = apply_fn(params, sdr, cfg)
    eps = 1e-3
    return jnp.mean(jnp.sqrt((pred - pq_truth) ** 2 + eps * eps))


def train(cfg: VideoHDRConfig, steps: int, batch: int,
          hdr_nits: np.ndarray, seed: int = 0,
          learning_rate: float = 1e-3, lr_decay: float = 0.3,
          mesh=None, log_every: int = 0, params=None):
    """Adam with f32 master weights; returns (params, losses).
    Mesh semantics match `sr_train.train` (batch sharded over the first
    axis, params replicated, XLA inserts the gradient psum)."""
    import optax

    sdr = jnp.asarray(degrade_to_sdr(hdr_nits, cfg))
    truth = jnp.asarray(hdr_truth_pq(hdr_nits, cfg))
    if params is None:
        params = init_params(jax.random.PRNGKey(seed), cfg)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), params)

    sched = optax.piecewise_constant_schedule(
        learning_rate, {int(steps * 0.6): lr_decay, int(steps * 0.85): lr_decay})
    tx = optax.adam(sched)
    opt = tx.init(params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        repl = NamedSharding(mesh, P())
        datash = NamedSharding(mesh, P(axis))
        params = jax.device_put(params, repl)
        opt = jax.device_put(opt, repl)

        def put_batch(a):
            return jax.device_put(a, datash)
    else:
        put_batch = lambda a: a

    @jax.jit
    def step_fn(params, opt, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb, cfg)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed + 1)
    losses = []
    n = hdr_nits.shape[0]
    for s in range(steps):
        idx = jnp.asarray(rng.integers(0, n, batch))
        params, opt, loss = step_fn(params, opt,
                                    put_batch(sdr[idx]), put_batch(truth[idx]))
        if log_every and (s % log_every == 0 or s == steps - 1):
            print(f"step {s:5d}  loss {float(loss):.5f}", flush=True)
        losses.append(loss)   # device value: no per-step host sync
    return params, [float(l) for l in losses]


def evaluate_pq_psnr(params, cfg: VideoHDRConfig,
                     hdr_val: np.ndarray) -> tuple[float, float]:
    """(net PQ-PSNR, deterministic-base PQ-PSNR) against the true HDR on
    held-out frames.  Both run the full apply path; the base is the
    zero-initialized net (exactly `inverse_tonemap_base`)."""
    sdr = jnp.asarray(degrade_to_sdr(hdr_val, cfg))
    truth = hdr_truth_pq(hdr_val, cfg)
    pred = np.asarray(jax.jit(lambda x: apply_fn(params, x, cfg))(sdr))
    base_p = init_params(jax.random.PRNGKey(0), cfg)
    base = np.asarray(jax.jit(lambda x: apply_fn(base_p, x, cfg))(sdr))

    def psnr(a):
        mse = float(np.mean((np.clip(a, 0, 1) - truth) ** 2))
        return float(10 * np.log10(1.0 / mse)) if mse else float("inf")

    return psnr(pred), psnr(base)
