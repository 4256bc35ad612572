"""Training driver for the three learned models (RAFT / sky UNet / TinyYOLO).

Replaces the reference's externally-trained sidecar weights (FlowNet2 docker,
HRNet docker, YOLOv4 server run-ids — ``/root/reference/src/datasets/
dataset.py:107-123``, ``validator.py:61-93``) with an in-repo, reproducible
recipe: scenes are synthesized ON DEVICE (``data/synthgen``) and the training
loop runs as a ``lax.scan`` over steps inside one jit — the host only
dispatches chunk calls and reads back loss curves, so the slow development
tunnel costs one round-trip per chunk instead of per step.

Usage::

    python -m mav_detection_tpu.cli.train --model all
    python -m mav_detection_tpu.cli.train --model raft --steps 4000
    python -m mav_detection_tpu.cli.train --model raft --eval-only

Checkpoints land in ``checkpoints/<name>.msgpack`` (see models/pretrained).
Held-out evaluation runs against the HOST fixture (``data/synthetic``), i.e.
a distribution the on-device generator mirrors but does not share RNG or
rendering code with.
"""
from __future__ import annotations

import argparse
import functools
import logging
import time
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger("mav_detection_tpu.train")


def _gray3(img: jax.Array) -> jax.Array:
    """(B, h, w) grayscale -> (B, h, w, 3) like the fixture's RGB frames."""
    return jnp.repeat(img[..., None], 3, axis=-1)


def _scan_chunks(run_chunk, params, opt_state, key, steps: int,
                 chunk: int, label: str, selector=None,
                 select_every: int = 1, save_best_to: str = ""):
    """Drive jitted scan-chunks, logging loss once per chunk.

    ``selector(params) -> float`` scores candidate weights on a held-out
    fixture after each chunk; the best-scoring params are returned instead
    of the last ones. This is the anti-overfit guard: the on-device
    generator domain is close to but not identical to the host fixture, and
    measured nets overtrained past their generalization peak (sky TPR
    collapsed 0.87 -> 0.0 between 1.5k and 8k steps without selection)."""
    t0 = time.time()
    all_losses = []
    done = 0
    n_chunks = 0
    # Seed the bar with the INITIAL weights' score: when resuming from a
    # checkpoint, the early (re-warmed-LR) chunks usually score worse than
    # the resumed weights, and with best_score=-inf the first selector call
    # would persist that regression over the checkpoint file.
    best_score = selector(params) if selector is not None else -np.inf
    best_params = params
    if selector is not None:
        logger.info(f"[{label}] initial holdout {best_score:.4f}")
    while done < steps:
        n = min(chunk, steps - done)
        params, opt_state, key, losses = run_chunk(params, opt_state, key, n)
        losses = np.asarray(losses)
        all_losses.append(losses)
        done += n
        n_chunks += 1
        msg = (f"[{label}] step {done}/{steps} loss {losses[-10:].mean():.4f} "
               f"({done / max(time.time() - t0, 1e-9):.1f} steps/s)")
        if selector is not None and (n_chunks % select_every == 0
                                     or done >= steps):
            score = selector(params)
            if score > best_score:
                best_score = score
                best_params = params
                if save_best_to:
                    # crash insurance: the remote TPU worker dies silently at
                    # times — persist every new best immediately
                    from mav_detection_tpu.models import checkpoint

                    checkpoint.save_msgpack(save_best_to,
                                            jax.device_get(best_params))
            msg += f" holdout {score:.4f} (best {best_score:.4f})"
        logger.info(msg)
    if selector is None:
        best_params = params
    return best_params, np.concatenate(all_losses) if all_losses else np.zeros(0)


# ------------------------------------------------------------------- RAFT
def train_raft(steps: int = 4000, batch: int = 8,
               hw: Tuple[int, int] = (128, 160), iters: int = 8,
               peak_lr: float = 2.5e-4, chunk: int = 100, seed: int = 0,
               init_params=None, save_best_to: str = "",
               drone_weight: float = 40.0, sin_blend: float = 0.6,
               pan_max: float = 0.0,
               devices: int = 0, config=None, use_selector: bool = True):
    """``devices > 1`` runs the chunk scan data-parallel over a 1-D
    ``data`` mesh (VERDICT r3 #4 / SURVEY §7 step 6): scene keys — and
    therefore generation, the loss, and its grads — shard over the batch
    axis; params/optimizer state are replicated and GSPMD inserts the psum
    for the mean loss's gradient. Same shardings the driver's
    ``__graft_entry__.dryrun_multichip`` train step validates.

    ``config``/``use_selector`` exist for tests (tiny model, no holdout
    eval); the product CLI always trains the full ``RAFTConfig``."""
    import optax

    from mav_detection_tpu.data.synthgen import generate_scene
    from mav_detection_tpu.models.raft import RAFTConfig, create_raft, raft_loss

    # argument validation first — before any model/optimizer construction
    # (optax's schedule would otherwise raise its own error for tiny steps
    # ahead of the device checks)
    mesh = key_sharding = None
    if devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        avail = jax.devices()
        if devices > len(avail):
            raise ValueError(
                f"--devices {devices} > {len(avail)} available devices")
        if batch % devices:
            raise ValueError(
                f"--batch {batch} must divide by --devices {devices}")
        mesh = Mesh(np.asarray(avail[:devices]), ("data",))
        key_sharding = NamedSharding(mesh, PartitionSpec("data"))

    h, w = hw
    config = config or RAFTConfig()
    model, params = create_raft(jax.random.PRNGKey(seed), config, image_hw=hw)
    if init_params is not None:
        params = init_params
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(200, steps // 10 + 1),
        decay_steps=steps)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    opt_state = opt.init(params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)
        logger.info(f"[raft] data-parallel over {devices} devices "
                    f"(per-device batch {batch // devices})")

    def loss_fn(params, scenes):
        img1 = _gray3(scenes.img1)
        img2 = _gray3(scenes.img2)
        # upweight the drone disc (dilated: the motion boundary matters as
        # much as the interior) — without this the net washes the intruder's
        # motion into the background and downstream phi-detection TPR
        # collapses (measured 0.11 vs 1.00 with GT flow)
        def wmap(seg):
            m = seg.astype(jnp.float32)[None, :, :, None]
            dil = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                        (1, 5, 5, 1), (1, 1, 1, 1), "SAME")
            return 1.0 + drone_weight * dil[0, :, :, 0]

        per = jax.vmap(
            lambda a, b, f, s: raft_loss(params, model, a, b, f, iters=iters,
                                         pixel_weight=wmap(s)))
        return jnp.mean(per(img1, img2, scenes.flow, scenes.seg))

    @functools.partial(jax.jit, static_argnames=("nsteps",))
    def run_chunk(params, opt_state, key, nsteps):
        def body(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, batch)
            if key_sharding is not None:
                # batch-shard the PRNG keys: generation, loss, and grads all
                # partition along the batch axis from this one constraint
                # (params replicated -> GSPMD psums the mean-loss gradient)
                keys = jax.lax.with_sharding_constraint(keys, key_sharding)
            scenes = jax.vmap(lambda k: generate_scene(
                k, h, w, sin_blend, pan_max=pan_max))(keys)
            loss, grads = jax.value_and_grad(loss_fn)(params, scenes)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=nsteps)
        return params, opt_state, key, losses

    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.raft import raft_flow

    # TWO selection fixtures with different scene parameters (and neither is
    # the reported eval fixture, seed 777 — selection must not touch the
    # number we report); the second adds a small fast intruder, the regime
    # the round-2 net was weakest in cross-domain
    sel_sets = [
        SyntheticDataset(params=SyntheticParams(
            seed=782, n_frames=4, foe=(140.0, 150.0), expansion=0.013,
            drone_start=(230.0, 90.0), drone_velocity=(-3.0, 2.5))),
        SyntheticDataset(params=SyntheticParams(
            seed=783, n_frames=4, foe=(180.0, 110.0), expansion=0.018,
            drone_radius=4, drone_start=(90.0, 150.0),
            drone_velocity=(4.0, -3.0))),
    ]

    def selector(p):
        # min-over-gates (VERDICT r2): overall and drone-region EPE on BOTH
        # fixtures share the 0.5 px gate — score by the WORST of the four so
        # the selector can never trade one metric past its gate for another;
        # the small sum term breaks ties toward improving all. Large-motion
        # (pan) training adds the uniform-shift ladder to the same pool so
        # selection can't keep a small-motion-only snapshot.
        worst = 0.0
        total = 0.0
        if pan_max > 0.0:
            ladder = shift_ladder_epe(p, iters=iters)
            worst = max(worst, ladder)
            total += ladder
        for ds in sel_sets:
            epes, depes = [], []
            for i in range(ds.N - 1):
                fl = np.asarray(raft_flow(p, jnp.asarray(ds.get_frame(i)),
                                          jnp.asarray(ds.get_frame(i + 1)),
                                          iters=iters))
                err = np.linalg.norm(fl - ds.flows[i], axis=-1)
                epes.append(err.mean())
                drone = ds.segs[i] > 0
                if drone.any():
                    depes.append(err[drone].mean())
            epe = float(np.mean(epes))
            depe = float(np.mean(depes or [0.0]))
            worst = max(worst, epe, depe)
            total += epe + depe
        return -(worst + 0.05 * total)

    # NOTE: the remote TPU worker kills single XLA programs running longer
    # than ~1 minute (watchdog); at ~0.7 s/step the scan chunk must stay
    # well under ~80 steps. Keep chunks small and select sparsely.
    params, losses = _scan_chunks(run_chunk, params, opt_state,
                                  jax.random.PRNGKey(seed + 1), steps, chunk,
                                  "raft",
                                  selector=selector if use_selector else None,
                                  select_every=10, save_best_to=save_best_to)
    return params, losses


def shift_ladder_epe(params, shifts: Tuple[int, ...] = (4, 8, 12),
                     hw: Tuple[int, int] = (256, 320), seed: int = 3,
                     iters: int = 0) -> float:
    """Worst-case EPE over uniform-shift image pairs — the large-motion
    probe that exposed the round-3 checkpoint's collapse at |flow| >= 4 px
    (exact at 1 px, predicted -3 px for a +4 px shift; PERF.md "RAFT motion
    cap"). The pair is the bench family's blurred-noise texture translated
    k px in x; EPE is the interior mean of |f - (k, 0)|."""
    import cv2

    from mav_detection_tpu.models.raft import PRODUCT_ITERS, raft_flow

    iters = iters or PRODUCT_ITERS
    h, w = hw
    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(
        rng.random((h + 64, w + 64)).astype(np.float32), (0, 0), 1.5)
    base = (base - base.min()) / max(np.ptp(base), 1e-6) * 220 + 20
    worst = 0.0
    for k in shifts:
        prev = base[32:32 + h, 32:32 + w]
        curr = base[32:32 + h, 32 - k:32 - k + w]
        f = np.asarray(raft_flow(
            params, jnp.repeat(jnp.asarray(prev)[..., None], 3, -1),
            jnp.repeat(jnp.asarray(curr)[..., None], 3, -1), iters=iters))
        err = np.hypot(f[..., 0] - k, f[..., 1])[24:-24, 24:-24].mean()
        worst = max(worst, float(err))
    return worst


def eval_raft(params, n_pairs: int = 12,
              iters: int = 0) -> Tuple[float, float]:
    """(overall EPE, drone-region EPE) on the held-out host fixture
    (240x320 forward-flight sequence). ``iters=0`` = the product default
    (``raft.PRODUCT_ITERS``) so gates measure what ships."""
    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.raft import PRODUCT_ITERS, raft_flow

    iters = iters or PRODUCT_ITERS

    ds = SyntheticDataset(params=SyntheticParams(seed=777, n_frames=n_pairs + 1,
                                                 foe=(150.0, 130.0),
                                                 expansion=0.015,
                                                 drone_start=(220.0, 80.0),
                                                 drone_velocity=(-3.5, 2.0)))
    epes, depes = [], []
    for i in range(n_pairs):
        img1 = jnp.asarray(ds.get_frame(i))
        img2 = jnp.asarray(ds.get_frame(i + 1))
        flow = np.asarray(raft_flow(params, img1, img2, iters=iters))
        err = np.linalg.norm(flow - ds.flows[i], axis=-1)
        epes.append(float(err.mean()))
        drone = ds.segs[i] > 0
        if drone.any():
            depes.append(float(err[drone].mean()))
    return float(np.mean(epes)), float(np.mean(depes or [0.0]))


def eval_raft_detection(params, n_pairs: int = 8,
                        iters: int = 0) -> Tuple[float, float]:
    """(RAFT-flow TPR, GT-flow TPR): run the full fixed-threshold detection
    step (derotation -> FoE -> phi -> masks) on the held-out fixture with the
    net's flow vs the analytic ground-truth flow. VERDICT r1 gate: the two
    TPRs within 5% — the net is a *component* only if the downstream detector
    can't tell it apart from truth (reference consumes FlowNet2 the same way,
    ``/root/reference/src/datasets/dataset.py:116-123``)."""
    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.raft import PRODUCT_ITERS, raft_flow
    from mav_detection_tpu.pipeline.detector import DetectionStep, detect_frame_pair

    iters = iters or PRODUCT_ITERS

    ds = SyntheticDataset(params=SyntheticParams(seed=777, n_frames=n_pairs + 1,
                                                 foe=(150.0, 130.0),
                                                 expansion=0.015,
                                                 drone_start=(220.0, 80.0),
                                                 drone_velocity=(-3.5, 2.0)))
    config = DetectionStep(foe_samples=512)
    tprs = {"raft": [], "gt": []}
    for i in range(n_pairs):
        img1 = jnp.asarray(ds.get_frame(i))
        img2 = jnp.asarray(ds.get_frame(i + 1))
        flows = {"raft": raft_flow(params, img1, img2, iters=iters),
                 "gt": jnp.asarray(ds.flows[i])}
        common = (
            jnp.asarray(ds.get_angular_difference(i, i + 1)
                        / ds.get_delta_time(i + 1), jnp.float32),
            jnp.asarray(ds.get_delta_time(i + 1), jnp.float32),
            jnp.asarray(ds.get_segmentation(i)[..., 0]),
            jnp.asarray(ds.get_sky_segmentation(i)),
            jnp.asarray(ds.get_depth(i), jnp.float32),
            jnp.asarray(ds.get_gt_foe(i), jnp.float32),
            jax.random.PRNGKey(i),
        )
        for name, fl in flows.items():
            out = detect_frame_pair(fl, jnp.zeros_like(fl), *common,
                                    config=config)
            tprs[name].append(float(out.tpr_fixed))
    return float(np.mean(tprs["raft"])), float(np.mean(tprs["gt"]))


# -------------------------------------------------------------------- sky
def train_sky(steps: int = 1500, batch: int = 8,
              hw: Tuple[int, int] = (240, 320), peak_lr: float = 1e-3,
              chunk: int = 100, seed: int = 0):
    import optax

    from mav_detection_tpu.data.synthgen import generate_scene
    from mav_detection_tpu.models.sky_segmentation import (
        create_sky_model, sky_loss)

    h, w = hw
    model, params = create_sky_model(jax.random.PRNGKey(seed), image_hw=hw)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(100, steps // 10 + 1), decay_steps=steps)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    def loss_fn(params, scenes):
        per = jax.vmap(lambda im, gt: sky_loss(params, model, im, gt))
        return jnp.mean(per(_gray3(scenes.img1), scenes.sky))

    @functools.partial(jax.jit, static_argnames=("nsteps",))
    def run_chunk(params, opt_state, key, nsteps):
        def body(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            scenes = jax.vmap(lambda k: generate_scene(k, h, w))(
                jax.random.split(sub, batch))
            loss, grads = jax.value_and_grad(loss_fn)(params, scenes)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=nsteps)
        return params, opt_state, key, losses

    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.sky_segmentation import sky_mask

    sel_ds = SyntheticDataset(params=SyntheticParams(seed=780, n_frames=4,
                                                     horizon=0.32))
    gt = sel_ds.sky_gt

    def selector(p):
        score = 0.0
        for i in range(sel_ds.N):
            est = np.asarray(sky_mask(p, jnp.asarray(sel_ds.get_frame(i))))
            tpr = (est & gt).sum() / max(gt.sum(), 1)
            fpr = (est & ~gt).sum() / max((~gt).sum(), 1)
            score += tpr - 10.0 * fpr
        return score / sel_ds.N

    params, losses = _scan_chunks(run_chunk, params, opt_state,
                                  jax.random.PRNGKey(seed + 1), steps, chunk,
                                  "sky", selector=selector)
    return params, losses


def eval_sky(params, n_frames: int = 12) -> Tuple[float, float, float, float]:
    """(net TPR, net FPR, precomputed-mask TPR, precomputed-mask FPR) vs the
    depth-band ground truth on the held-out host fixture."""
    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.sky_segmentation import sky_mask

    ds = SyntheticDataset(params=SyntheticParams(seed=778, n_frames=n_frames,
                                                 horizon=0.4))
    gt = ds.sky_gt
    stats = np.zeros(4)
    for i in range(n_frames):
        est = np.asarray(sky_mask(params, jnp.asarray(ds.get_frame(i))))
        pre = np.asarray(ds.get_sky_segmentation(i))
        stats += [
            (est & gt).sum() / max(gt.sum(), 1),
            (est & ~gt).sum() / max((~gt).sum(), 1),
            (pre & gt).sum() / max(gt.sum(), 1),
            (pre & ~gt).sum() / max((~gt).sum(), 1),
        ]
    return tuple(stats / n_frames)  # type: ignore[return-value]


# ------------------------------------------------------------------- yolo
def train_yolo(steps: int = 2500, batch: int = 8,
               hw: Tuple[int, int] = (240, 320), peak_lr: float = 1e-3,
               chunk: int = 100, seed: int = 0,
               mode: str = "APPEARANCE_RGB"):
    """Train TinyYOLO on mode-appropriate imagery. ``mode`` selects the
    inference-input rendering (the reference trains separate YOLOv4 weights
    per mode, ``/root/reference/settings.json:2-4``): training imagery is
    synthesized ON DEVICE by ``pipeline/mode_imagery.mode_image_device``
    (flow-vis / radial / ego-motion residual from the generator's GT flow),
    fused into the train step; selection scores the host fixture through the
    exact numpy transform inference uses."""
    import optax

    from mav_detection_tpu.data.synthgen import generate_scene
    from mav_detection_tpu.models.yolo import create_yolo, yolo_loss
    from mav_detection_tpu.pipeline.mode_imagery import (
        mode_image_device,
        mode_image_host,
    )

    h, w = hw
    model, params = create_yolo(jax.random.PRNGKey(seed), image_hw=hw)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(100, steps // 10 + 1), decay_steps=steps)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    def loss_fn(params, scenes, keys):
        imgs = jax.vmap(
            lambda im, fl, k: mode_image_device(im, fl, mode, k))(
                scenes.img1, scenes.flow, keys)
        per = jax.vmap(lambda im, box: yolo_loss(params, model, im, box))
        return jnp.mean(per(imgs, scenes.box))

    @functools.partial(jax.jit, static_argnames=("nsteps",))
    def run_chunk(params, opt_state, key, nsteps):
        def body(carry, _):
            params, opt_state, key = carry
            key, sub, sub2 = jax.random.split(key, 3)
            scenes = jax.vmap(lambda k: generate_scene(k, h, w))(
                jax.random.split(sub, batch))
            loss, grads = jax.value_and_grad(loss_fn)(
                params, scenes, jax.random.split(sub2, batch))
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=nsteps)
        return params, opt_state, key, losses

    from mav_detection_tpu.core.rectangle import Rectangle
    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.yolo import detect_boxes

    # Two selection fixtures with different seed/size/motion; the selector
    # takes the MIN of their mean IoUs — a single 6-frame fixture proved
    # noisy enough that a checkpoint could improve it while regressing other
    # seeds of the same family (observed on FLOW_FOE_YOLO at 6000 steps,
    # PERF.md "per-mode"). Min-over-fixtures is the same robustness rule the
    # RAFT selector uses.
    sel_fixtures = [
        SyntheticDataset(params=SyntheticParams(
            seed=781, n_frames=6, drone_radius=8, drone_start=(250.0, 170.0),
            drone_velocity=(-5.0, -2.0))),
        SyntheticDataset(params=SyntheticParams(
            seed=787, n_frames=6, drone_radius=12, drone_start=(70.0, 60.0),
            drone_velocity=(4.5, 2.5))),
    ]

    def _fixture_image(ds, i):
        frame = ds.get_frame(i)
        if mode == "APPEARANCE_RGB":
            return frame
        j = min(i, ds.N - 2)
        return mode_image_host(frame, np.asarray(ds.flows[j], np.float32),
                               mode, seed=i)

    def _fixture_iou(p, ds):
        total = 0.0
        for i in range(ds.N):
            boxes = detect_boxes(p, jnp.asarray(_fixture_image(ds, i)),
                                 score_threshold=0.5)
            gtr = ds.get_annotation(i)[0]
            valid = np.asarray(boxes.valid)
            xywh = np.asarray(boxes.xywh)
            best = 0.0
            for j in range(len(valid)):
                if valid[j]:
                    x, y, bw, bh = xywh[j]
                    best = max(best, Rectangle.calculate_iou_safe(
                        Rectangle((x - bw / 2, y - bh / 2), (bw, bh)), gtr))
            total += best
        return total / ds.N

    def selector(p):
        return min(_fixture_iou(p, ds) for ds in sel_fixtures)

    params, losses = _scan_chunks(run_chunk, params, opt_state,
                                  jax.random.PRNGKey(seed + 1), steps, chunk,
                                  f"yolo[{mode}]", selector=selector)
    return params, losses


def eval_yolo(params, n_frames: int = 12, score_threshold: float = 0.5,
              mode: str = "APPEARANCE_RGB") -> Tuple[float, float]:
    """(mean IoU of the best box vs annotation, detection rate) on the
    held-out host fixture, rendered through the mode's inference transform."""
    from mav_detection_tpu.core.rectangle import Rectangle
    from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
    from mav_detection_tpu.models.yolo import detect_boxes
    from mav_detection_tpu.pipeline.mode_imagery import mode_image_host

    ds = SyntheticDataset(params=SyntheticParams(seed=779, n_frames=n_frames,
                                                 drone_radius=11,
                                                 drone_start=(240.0, 70.0),
                                                 drone_velocity=(-4.0, 3.0)))
    ious = []
    hits = 0
    for i in range(n_frames):
        frame = ds.get_frame(i)
        if mode != "APPEARANCE_RGB":
            j = min(i, ds.N - 2)
            frame = mode_image_host(frame, np.asarray(ds.flows[j], np.float32),
                                    mode, seed=i)
        boxes = detect_boxes(params, jnp.asarray(frame),
                             score_threshold=score_threshold)
        gt = ds.get_annotation(i)[0]
        valid = np.asarray(boxes.valid)
        best = 0.0
        for j in range(len(valid)):
            if not valid[j]:
                continue
            x, y, bw, bh = np.asarray(boxes.xywh[j])
            rect = Rectangle((x - bw / 2, y - bh / 2), (bw, bh))
            best = max(best, Rectangle.calculate_iou_safe(rect, gt))
        ious.append(best)
        hits += best > 0.25
    return float(np.mean(ious)), hits / n_frames


# --------------------------------------------------------------------- cli
def main(argv=None) -> None:
    from mav_detection_tpu.models import checkpoint, pretrained

    parser = argparse.ArgumentParser(description="train the learned models")
    parser.add_argument("--model", choices=["raft", "sky", "yolo", "all"],
                        default="all")
    parser.add_argument("--steps", type=int, default=0,
                        help="override the per-model default step count")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--chunk", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hw", type=str, default="",
                        help="HxW training resolution override, e.g. 240x320")
    parser.add_argument("--drone-weight", type=float, default=40.0,
                        help="loss upweight inside the (dilated) drone mask")
    parser.add_argument("--lr", type=float, default=0.0,
                        help="override peak LR (e.g. lower it when resuming)")
    parser.add_argument("--yolo-mode", default="APPEARANCE_RGB",
                        choices=["APPEARANCE_RGB", "FLOW_UV", "FLOW_RADIAL",
                                 "FLOW_FOE_YOLO"],
                        help="detection mode whose imagery TinyYOLO trains "
                        "on; the checkpoint ships as yolo_<mode>.msgpack "
                        "(reference: per-mode yolo_train_weights run-ids)")
    parser.add_argument("--devices", type=int, default=0,
                        help="data-parallel RAFT training over N devices "
                             "(1-D data mesh; params replicated, grads "
                             "psummed — VERDICT r3 #4)")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="initialize from the existing checkpoint")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    wanted = ["raft", "sky", "yolo"] if args.model == "all" else [args.model]

    # --hw/--lr overrides apply to EVERY model branch (they were silently
    # dropped for sky/yolo before)
    kw = {}
    if args.hw:
        h, w = args.hw.lower().split("x")
        kw["hw"] = (int(h), int(w))
    if args.lr:
        kw["peak_lr"] = args.lr

    if "raft" in wanted:
        if args.eval_only:
            params = pretrained.load_raft_params()
            assert params is not None, "no RAFT checkpoint"
        else:
            init = pretrained.load_raft_params() if args.resume else None
            params, _ = train_raft(steps=args.steps or 4000, batch=args.batch,
                                   chunk=args.chunk, seed=args.seed,
                                   init_params=init,
                                   drone_weight=args.drone_weight,
                                   save_best_to=pretrained.checkpoint_path("raft"),
                                   devices=args.devices,
                                   **kw)
            checkpoint.save_msgpack(pretrained.checkpoint_path("raft"), params)
        epe, depe = eval_raft(params)
        logger.info(f"[raft] held-out fixture EPE: {epe:.4f} px (gate < 0.5), "
                    f"drone-region EPE {depe:.4f} px")
        rtpr, gtpr = eval_raft_detection(params)
        logger.info(f"[raft] detection TPR (fixed threshold): RAFT flow "
                    f"{rtpr:.4f} vs GT flow {gtpr:.4f} "
                    f"(gate: within 0.05)")

    if "sky" in wanted:
        if args.eval_only:
            params = pretrained.load_sky_params()
            assert params is not None, "no sky checkpoint"
        else:
            params, _ = train_sky(steps=args.steps or 1500, batch=args.batch,
                                  chunk=args.chunk, seed=args.seed, **kw)
            checkpoint.save_msgpack(pretrained.checkpoint_path("sky"), params)
        tpr, fpr, ptpr, pfpr = eval_sky(params)
        logger.info(f"[sky] net TPR {tpr:.4f} FPR {fpr:.4f} | "
                    f"precomputed TPR {ptpr:.4f} FPR {pfpr:.4f}")

    if "yolo" in wanted:
        mode = args.yolo_mode
        ckpt = pretrained.checkpoint_path(pretrained.yolo_checkpoint_name(mode))
        if args.eval_only:
            params = pretrained.load_yolo_params(mode)
            assert params is not None, "no yolo checkpoint"
        else:
            params, _ = train_yolo(steps=args.steps or 2500, batch=args.batch,
                                   chunk=args.chunk, seed=args.seed, mode=mode,
                                   **kw)
            checkpoint.save_msgpack(ckpt, params)
        iou, rate = eval_yolo(params, mode=mode)
        logger.info(f"[yolo:{mode}] held-out mean IoU {iou:.3f}, "
                    f"detection rate {rate:.2f}")


if __name__ == "__main__":
    main()
