"""Non-synthetic evaluation content for the learned models.

The trainers' synthetic generators (sr_train.synth_frames,
hdr_train.synth_hdr_frames) cover edges/textures/glyphs analytically; this
module evaluates the SHIPPED checkpoints on a real photograph so the quality
claims are validated on natural image statistics (sensor noise, skin,
fabric, specular highlights) the generators can't fake.

Source material: matplotlib's bundled ``grace_hopper.jpg`` (a 512x600 RGB
photograph shipped with the package — the only real photographic asset in
the hermetic environment).  A sliding-crop pan over the photo yields a
multi-frame clip; for the HDR model the real texture is graded to linear
light with the trainer's own highlight model (real spatial/chroma
statistics, synthetic luminance grade — an SDR photo carries no true HDR
ground truth).

Reference slot: the vendor SuperRes / TrueHDR quality validation
(Source/D3D11VP.cpp:712-891 exposes the toggles; the reference relies on
the driver's own training, so this subsystem has no upstream counterpart).
"""

from __future__ import annotations

import numpy as np


def real_photo() -> np.ndarray:
    """The bundled real photograph as (H, W, 3) float32 in [0, 1]."""
    import os
    import matplotlib
    from PIL import Image
    path = os.path.join(matplotlib.get_data_path(), "sample_data",
                        "grace_hopper.jpg")
    return np.asarray(Image.open(path), np.float32) / 255.0


def _pygame_images_dir() -> str | None:
    try:
        import pygame
    except ImportError:
        return None
    import os
    d = os.path.join(os.path.dirname(pygame.__file__), "docs", "generated",
                     "_images")
    return d if os.path.isdir(d) else None


def real_photos() -> list[tuple[str, np.ndarray]]:
    """Every real photographic asset the hermetic environment offers, as
    (name, (H, W, 3) float32 [0,1]) pairs — distinct scenes/sensors so the
    model-vs-classical verdict is not a one-photo artifact:

     * ``grace_hopper`` — matplotlib's 512x600 studio portrait (skin,
       fabric, flag stripes);
     * ``camera_background`` / ``camera_average`` — pygame's 320x240
       webcam shots of a room scene (sensor noise, clutter, low light);
     * ``intro_freedom`` / ``intro_blade`` — pygame's 200x150 outdoor
       photos (foliage, sky gradients, motion);
     * ``mri_slice`` — matplotlib's s1045.ima.gz 256x256 MRI scan
       (non-optical sensor content, grayscale replicated to RGB).

    Assets are loaded defensively: missing packages drop their entries
    (callers assert on the minimum count they need)."""
    import gzip
    import os

    out = [("grace_hopper", real_photo())]

    pg = _pygame_images_dir()
    if pg is not None:
        from PIL import Image
        for name in ("camera_background", "camera_average",
                     "intro_freedom", "intro_blade"):
            p = os.path.join(pg, f"{name}.jpg")
            if os.path.exists(p):
                out.append((name,
                            np.asarray(Image.open(p).convert("RGB"),
                                       np.float32) / 255.0))

    try:
        import matplotlib
        p = os.path.join(matplotlib.get_data_path(), "sample_data",
                         "s1045.ima.gz")
        with gzip.open(p, "rb") as f:
            raw = np.frombuffer(f.read(), np.uint16).reshape(256, 256)
        g = (raw.astype(np.float32) / max(float(raw.max()), 1.0))
        out.append(("mri_slice", np.repeat(g[..., None], 3, axis=-1)))
    except (OSError, ValueError):
        pass
    return out


def real_frames(n: int, size: int, seed: int = 0,
                photo: np.ndarray | None = None) -> np.ndarray:
    """(n, size, size, 3) float32 [0,1] crops panning over the real photo —
    deterministic start/end corners with jitter, like a slow camera move."""
    img = real_photo() if photo is None else photo
    h, w = img.shape[:2]
    if h < size or w < size:
        reps = (-(-size // h) + 1, -(-size // w) + 1)
        img = np.tile(img, reps + (1,))
        h, w = img.shape[:2]
    rng = np.random.default_rng(seed)
    ys = np.linspace(0, h - size, n)
    xs = np.linspace(0, w - size, n)
    out = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        y = int(np.clip(ys[i] + rng.integers(-4, 5), 0, h - size))
        x = int(np.clip(xs[i] + rng.integers(-4, 5), 0, w - size))
        out[i] = img[y:y + size, x:x + size]
    return out


def real_hdr_frames(n: int, size: int, seed: int = 0, cfg=None) -> np.ndarray:
    """(n, size, size, 3) float32 linear-light nits: the real photo as the
    diffuse plate (graded to the SDR white level) plus the trainer's
    highlight model on top — real texture under an HDR grade."""
    from .hdr_train import synth_hdr_frames
    from .videohdr import VideoHDRConfig
    cfg = cfg or VideoHDRConfig()
    diffuse = real_frames(n, size, seed=seed) * cfg.sdr_nits
    # borrow only the highlight layer from the synthetic generator: its
    # diffuse base is a known gradient, subtract it out
    from .sr_train import synth_frames
    synth = synth_hdr_frames(seed=seed, n=n, size=size, cfg=cfg)
    synth_base = synth_frames(seed=seed + 1, n=n, size=size) * cfg.sdr_nits
    highlights = np.maximum(synth - synth_base, 0.0)
    return np.clip(diffuse + highlights, 0.0, cfg.peak_nits).astype(np.float32)


def _repo_weights(name: str) -> str:
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "weights", name)


def load_shipped_superres():
    """(params, cfg) from the shipped checkpoint (weights/superres_2x.npz);
    raises FileNotFoundError when absent."""
    import jax
    from .checkpoint import load_params
    from .superres import SuperResConfig, init_params
    cfg = SuperResConfig()
    like = init_params(jax.random.PRNGKey(0), cfg)
    return load_params(_repo_weights("superres_2x.npz"), like), cfg


def load_shipped_videohdr():
    """(params, cfg) from the shipped checkpoint (weights/videohdr.npz)."""
    import jax
    from .checkpoint import load_params
    from .videohdr import VideoHDRConfig, init_params
    cfg = VideoHDRConfig()
    like = init_params(jax.random.PRNGKey(0), cfg)
    return load_params(_repo_weights("videohdr.npz"), like), cfg


def evaluate_real(sr_params=None, sr_cfg=None, hdr_params=None, hdr_cfg=None,
                  n: int = 12, size: int = 128, seed: int = 7) -> dict:
    """PSNR of the shipped checkpoints on real-photo content, alongside the
    classical baselines the nets must beat (the same comparators the
    synthetic gates use: the classical upscale for SR, the deterministic
    inverse-tonemap base for VideoHDR).  Pass params/cfg or let the shipped
    checkpoints load.  Returns a flat dict of dB numbers."""
    from .sr_train import evaluate_psnr
    from .hdr_train import evaluate_pq_psnr

    out = {"content": "matplotlib grace_hopper.jpg (real photograph)",
           "frames": n, "size": size}

    if sr_params is None:
        sr_params, sr_cfg = load_shipped_superres()
    hr = real_frames(n, size, seed=seed)
    net_db, classical_db = evaluate_psnr(sr_params, sr_cfg, hr)
    out["superres_net_db"] = float(net_db)
    out["superres_classical_db"] = float(classical_db)
    out["superres_margins_db"] = {
        name: float(np.subtract(*evaluate_psnr(
            sr_params, sr_cfg, real_frames(n, size, seed=seed, photo=img))))
        for name, img in real_photos()}

    if hdr_params is None:
        hdr_params, hdr_cfg = load_shipped_videohdr()
    hdr = real_hdr_frames(n, size, seed=seed, cfg=hdr_cfg)
    net_db, base_db = evaluate_pq_psnr(hdr_params, hdr_cfg, hdr)
    out["videohdr_net_db"] = float(net_db)
    out["videohdr_base_db"] = float(base_db)
    return out
