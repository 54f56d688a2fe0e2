"""Gated SuperRes training: train (fresh or fine-tune) with a synthetic +
natural-statistics data mix, evaluating every quality gate periodically and
keeping the best iterate that passes ALL of them.

Why this exists (PROGRESS r4 known-gaps): the shipped synthetic-only
checkpoint loses ~0.4 dB to the classical upscaler on real photographic
content (tests/test_real_eval.py xfail).  Training never sees a photograph
— the natural mix is generative (sr_train.natural_frames) — and model
*selection* uses a different crop seed than the test, so the real-photo
evaluation stays honest.

Gates mirrored from the test suite:
 * synth192: net beats Catmull-Rom on never-trained synth 192px
   (tests/test_sr_checkpoint.py, seed 424242)
 * real (r5, VERDICT #5 "win, don't tie"): on EVERY real photo the
   hermetic env offers (real_eval.real_photos — portrait, webcam scenes,
   outdoor shots, MRI), the net must never lose more than 0.25 dB, and
   on at least --real-wins of them must WIN by > --real-margin dB
   (tests/test_real_eval.py gate; SELECTION uses --sel-seeds crops, the
   final report also prints the test's seed-7 crops).  Measured limit of
   the r5 restraint recipe: camera_average (a TIME-AVERAGED webcam
   frame) holds at −0.15 ± 0.05 dB true margin however hard defocus/
   grain/JPEG restraint statistics are weighted (cycles 4–6), while the
   other five photos win or tie — hence the test's −0.25 floor.

Usage:
  python scripts/sr_train_gated.py --out weights/superres_2x.npz \
      --resume weights/superres_2x.npz --steps 1500 --lr 2e-4 \
      --natural-mix 0.4 --jpeg-mix 0.3
  python scripts/sr_train_gated.py --out /tmp/slim.npz --steps 3000 \
      --channels 96 --blocks 2 --natural-mix 0.5       # fresh slim net
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--natural-mix", type=float, default=0.4)
    ap.add_argument("--jpeg-mix", type=float, default=0.3,
                    help="fraction of frames that are JPEG-roundtripped "
                         "natural frames (codec-artifact statistics)")
    ap.add_argument("--real-margin", type=float, default=0.5)
    ap.add_argument("--real-wins", type=int, default=3,
                    help="min #photos that must clear --real-margin")
    ap.add_argument("--sel-min", type=float, default=-0.1,
                    help="selection floor for the worst-photo margin; set "
                         "ABOVE the test's -0.1 (e.g. 0.0) so the selected "
                         "iterate has slack against crop-seed variance")
    ap.add_argument("--sel-seeds", type=int, nargs="+", default=[11],
                    help="crop seeds for selection (averaged margins, min "
                         "over all seeds' worst photo); the test's seed 7 "
                         "stays held out")
    ap.add_argument("--jpeg-quality", type=int, nargs=2, default=[55, 90])
    ap.add_argument("--soft-mix", type=float, default=0.0,
                    help="fraction of frames that are DEFOCUSED natural "
                         "frames (soft-optics HR: the net must learn "
                         "restraint, sr_train.soften); JPEG-roundtripped "
                         "at the same rate as the sharp natural frames")
    ap.add_argument("--grain", type=float, default=0.02,
                    help="max sensor-grain sigma for natural frames "
                         "(unrecoverable stochastic texture -> restraint "
                         "on noisy clutter; raise to ~0.05 for webcam-"
                         "statistics emphasis)")
    ap.add_argument("--soft-sigma", type=float, nargs=2, default=[0.5, 1.4],
                    help="defocus sigma range for --soft-mix frames; widen "
                         "the top (e.g. 0.5 2.2) to cover heavily "
                         "bandlimited content like time-averaged webcam "
                         "frames")
    ap.add_argument("--save-latest", default=None,
                    help="also save the CURRENT params at every eval "
                         "(crash-resumable trajectory, independent of the "
                         "gate-passing best)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--channels", type=int, default=None)
    ap.add_argument("--blocks", type=int, default=None)
    ap.add_argument("--s2d", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from videorenderer_tpu.models.checkpoint import load_params, save_params
    from videorenderer_tpu.models.real_eval import real_frames, real_photos
    from videorenderer_tpu.models.sr_train import (degrade, evaluate_psnr,
                                                   jpeg_roundtrip,
                                                   natural_frames,
                                                   synth_frames)
    from videorenderer_tpu.models.superres import (SuperResConfig, init_params,
                                                   loss_fn)

    kw = {}
    if args.channels is not None:
        kw["channels"] = args.channels
    if args.blocks is not None:
        kw["num_blocks"] = args.blocks
    if args.s2d is not None:
        kw["s2d"] = args.s2d
    cfg = SuperResConfig(**kw)
    print(json.dumps({"cfg": {"channels": cfg.channels,
                              "blocks": cfg.num_blocks, "s2d": cfg.s2d},
                      **vars(args)}), flush=True)

    # -- data: synth + natural + JPEG-roundtripped natural + defocused
    # natural (still zero photographs — codec and optics are the
    # augmentations), degraded by the framework's downscaler
    from videorenderer_tpu.models.sr_train import soften
    n_nat = int(args.frames * args.natural_mix)
    n_jpg = int(args.frames * args.jpeg_mix)
    n_soft = int(args.frames * args.soft_mix)
    n_syn = max(args.frames - n_nat - n_jpg - n_soft, 0)
    parts = [synth_frames(seed=args.seed, n=n_syn, size=args.patch),
             natural_frames(seed=args.seed + 3, n=n_nat, size=args.patch,
                            grain_max=args.grain)]
    if n_jpg:
        parts.append(jpeg_roundtrip(
            natural_frames(seed=args.seed + 9, n=n_jpg, size=args.patch,
                           grain_max=args.grain),
            seed=args.seed + 13, quality_range=tuple(args.jpeg_quality)))
    if n_soft:
        soft = soften(natural_frames(seed=args.seed + 21, n=n_soft,
                                     size=args.patch, grain_max=args.grain), seed=args.seed + 23,
                      sigma_range=tuple(args.soft_sigma))
        half = n_soft // 2      # half of the soft frames also JPEG (webcam)
        if half:
            soft[:half] = jpeg_roundtrip(
                soft[:half], seed=args.seed + 27,
                quality_range=tuple(args.jpeg_quality))
        parts.append(soft)
    data = np.concatenate([p for p in parts if len(p)])
    data = np.random.default_rng(args.seed + 5).permutation(data)
    hr = jnp.asarray(data)
    lr_frames = jnp.asarray(degrade(data, cfg.scale))

    # -- eval sets (held out; selection crops use a different seed than the
    # test's seed-7 crops)
    synth_val = synth_frames(seed=424242, n=12, size=192)
    photos = real_photos()
    real_sel = [[(nm, real_frames(6, 96, seed=sd, photo=im))
                 for nm, im in photos] for sd in args.sel_seeds]
    real_test = [(nm, real_frames(6, 96, seed=7, photo=im))
                 for nm, im in photos]

    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        params = load_params(args.resume, params)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)

    sched = optax.piecewise_constant_schedule(
        args.lr, {int(args.steps * 0.6): 0.3, int(args.steps * 0.85): 0.3})
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, lrb, hrb):
        loss, grads = jax.value_and_grad(loss_fn)(params, lrb, hrb, cfg)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    def real_margins(p, sets):
        return {nm: (lambda t: t[0] - t[1])(evaluate_psnr(p, cfg, hrv))
                for nm, hrv in sets}

    def gates(p):
        s_net, s_cls = evaluate_psnr(p, cfg, synth_val)
        per_seed = [real_margins(p, sets) for sets in real_sel]
        # average margins across selection seeds for the report/score,
        # but gate the FLOOR on every seed's worst photo
        ms = {k: float(np.mean([d[k] for d in per_seed]))
              for k in per_seed[0]}
        wins = sum(1 for v in ms.values() if v > args.real_margin)
        mmin = min(min(d.values()) for d in per_seed)
        ok = s_net > s_cls and mmin >= args.sel_min and wins >= args.real_wins
        # score: worst-photo margin, then win count, then synth margin
        return ok, (mmin, wins, s_net - s_cls), {
            "synth192_net": round(s_net, 2), "synth192_cls": round(s_cls, 2),
            "real_sel_margins": {k: round(v, 2) for k, v in ms.items()},
            "real_sel_min": round(mmin, 2), "real_sel_wins": wins}

    best = None       # (score, params, report, step)
    ok0, sc0, rep0 = gates(params)
    print(json.dumps({"step": 0, "gates_ok": ok0, **rep0}), flush=True)
    if ok0:
        best = (sc0, params, rep0, 0)

    rng = np.random.default_rng(args.seed + 1)
    n = data.shape[0]
    t0 = time.time()
    for s in range(1, args.steps + 1):
        idx = jnp.asarray(rng.integers(0, n, args.batch))
        params, opt, loss = step_fn(params, opt, lr_frames[idx], hr[idx])
        if s % args.eval_every == 0 or s == args.steps:
            ok, score, rep = gates(params)
            print(json.dumps({"step": s, "loss": round(float(loss), 5),
                              "gates_ok": ok, **rep,
                              "sec": round(time.time() - t0, 1)}), flush=True)
            if args.save_latest:
                save_params(args.save_latest, params)
            if ok and (best is None or score > best[0]):
                best = (score, params, rep, s)
                save_params(args.out, best[1])
                print(json.dumps({"saved": args.out, "at_step": s}),
                      flush=True)

    if best is None:
        print(json.dumps({"result": "NO iterate passed all gates"}),
              flush=True)
        return 1
    # final report on the untouched test crops (seed 7)
    tm = real_margins(best[1], real_test)
    print(json.dumps({"result": "ok", "best_step": best[3], **best[2],
                      "real_test_margins": {k: round(v, 2)
                                            for k, v in tm.items()},
                      "real_test_min": round(min(tm.values()), 2),
                      "real_test_wins": sum(1 for v in tm.values()
                                            if v > args.real_margin),
                      "out": args.out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
