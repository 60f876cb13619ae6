"""Full training orchestration: the TPU equivalent of train.py + the
Lightning system (reference train.py:16-71,
lightning_modules/neuconw_system.py:60-546).

One Python loop drives: RayPool batches -> pjit'd train step (data-mesh
sharded) -> periodic octree refinement (UPDATE_FREQ) -> periodic
checkpoints (SAVE_FREQ) -> periodic validation (VAL_FREQ fraction of an
epoch). The fine surface grid is a dynamic DeviceGrid operand, so the
first refinement triggers exactly one retrace (fine grid goes from
absent to present) and later refreshes reuse the compiled step.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.cache import RayPool, local_split_names, read_ray_cache
from ..datasets.mask_utils import get_label_id_mapping
from ..datasets.phototourism import load_scene_meta
from ..models.neuconw import field_config_from_cfg
from ..ops.ray_voxel import make_device_grid
from ..ops.voxel_grid import VoxelGrid
from ..parallel.mesh import make_mesh, shard_rays
from ..rendering.renderer import render_config_from_cfg
from .checkpoint import restore_checkpoint, save_checkpoint
from .losses import loss_config_from_cfg
from .schedule import make_optimizer
from .step import init_state, jit_train_step, make_render_fn, make_train_step
from .surface import octree_update, surface_level


def val_interval(val_freq: float, steps_per_epoch: int) -> int:
    """Steps between validations. VAL_FREQ follows Lightning's
    val_check_interval dual semantics (reference train.py:57, per-scene
    configs use 10000.0 = every 10k steps, defaults 0.125 = 8x/epoch):
    values <= 1.0 are a fraction of an epoch (Lightning treats float 1.0
    as once per epoch), values > 1 are a step count."""
    if val_freq > 1.0:
        return int(val_freq)
    return max(int(steps_per_epoch * val_freq), 1)


class MetricsLogger:
    """JSONL scalar logging (stands in for TestTubeLogger,
    reference train.py:38-42); optionally mirrors to tensorboard when
    torch's SummaryWriter is importable."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def log(self, step: int, scalars: dict):
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)


class NullLogger:
    """Non-main processes in a multihost run log nowhere (the reference
    logs through Lightning's rank-zero-only logger, train.py:38-42)."""

    path = None

    def log(self, step: int, scalars: dict):
        pass


@dataclass
class TrainerConfig:
    batch_size: int = 2048
    num_epochs: int = 20
    test_batch_size: int = 512
    exp_name: str = "exp"
    save_dir: str = "results"
    ckpt_path: str | None = None
    val_freq_steps: int | None = None  # default: VAL_FREQ fraction of epoch
    # capture a jax profiler trace over steps [start, start+count)
    # (stands in for Lightning profiler="simple", reference train.py:59)
    profile_start: int = -1
    profile_steps: int = 20


class Trainer:
    """End-to-end single-controller trainer for one scene."""

    def __init__(self, cfg, tcfg: TrainerConfig, mesh=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = int(np.prod(self.mesh.devices.shape))
        self.world_batch = tcfg.batch_size * 1  # rays are global, sharded

        from ..utils.scene import load_scene_bundle

        root = cfg.DATASET.ROOT_DIR
        # SFM occupancy grid: validation near/far override + surface init
        self.meta, self.scene, self.sfm_grid, self.sfm_dgrid = (
            load_scene_bundle(cfg))
        sc = self.meta.scene_config
        self.train_level = surface_level(sc, float(cfg.NEUCONW.TRAIN_VOXEL_SIZE))

        self.fc = field_config_from_cfg(cfg)
        self.lcfg = loss_config_from_cfg(cfg)
        self.opt, self.lr_schedule = make_optimizer(cfg, tcfg.batch_size)

        lid = get_label_id_mapping()
        rml = cfg.NEUCONW.RAY_MASK_LIST
        self.ray_mask_ids = tuple(lid[x] for x in rml) if rml else ()

        self.anneal_end = int(cfg.NEUCONW.ANNEAL_END)
        self.update_freq = int(cfg.NEUCONW.UPDATE_FREQ)
        self.save_freq = int(cfg.TRAINER.SAVE_FREQ)
        self.sdf_threshold = float(cfg.NEUCONW.SDF_THRESHOLD)

        # two step variants: warm-up (no fine grid) and surface-guided
        self._steps = {}
        self.fine_grid_host: VoxelGrid | None = None
        self.fine_dgrid = None
        self.device_pool = None

        self.exp_dir = os.path.join(tcfg.save_dir, tcfg.exp_name)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        # multihost: every process computes in lockstep (SPMD), but only
        # process 0 writes artifacts — checkpoints, metrics, val images
        # (the reference's rank_zero_only Lightning behavior)
        self.is_main = jax.process_index() == 0
        self.logger = (MetricsLogger(os.path.join(self.exp_dir, "logs"))
                       if self.is_main else NullLogger())

        key = jax.random.PRNGKey(int(cfg.TRAINER.SEED))
        self.state = init_state(key, self.fc, self.opt)
        if tcfg.ckpt_path:
            # restore against the freshly-initialized tree so orbax
            # rebuilds optax's NamedTuple states instead of raw dicts
            template = {
                "params": jax.device_get(self.state.params),
                "step": np.asarray(0, np.int64),
                "opt_state": jax.device_get(self.state.opt_state),
            }
            try:
                restored = restore_checkpoint(tcfg.ckpt_path, template)
            except Exception:  # params-only checkpoint
                restored = restore_checkpoint(tcfg.ckpt_path, None)
                restored.pop("opt_state", None)
            self.state = self.state._replace(
                params=restored["params"],
                step=jnp.asarray(int(restored["step"]), jnp.int32),
            )
            if "opt_state" in restored:
                self.state = self.state._replace(opt_state=restored["opt_state"])
            if "fine_grid" in restored:
                self.fine_grid_host = restored["fine_grid"]
                self.fine_dgrid = make_device_grid(self.fine_grid_host)

        self._render_chunk = None
        self._val_meta = None

    # ------------------------------ data ------------------------------

    def load_rays(self) -> RayPool:
        p = self.cfg.DATASET.PHOTOTOURISM
        split_root = os.path.join(self.cfg.DATASET.ROOT_DIR, p.CACHE_DIR, "splits")
        names = None
        if jax.process_count() > 1:
            names = local_split_names(split_root, jax.process_count(),
                                      jax.process_index())
        rays, rgbs = read_ray_cache(split_root, names, p.IMG_DOWNSCALE)
        return RayPool(rays, rgbs, with_semantics=p.WITH_SEMANTICS,
                       seed=int(self.cfg.TRAINER.SEED))

    # ------------------------------ steps ------------------------------

    def _get_step(self, with_fine: bool):
        key = ("fine" if with_fine else "warm")
        if key not in self._steps:
            rcfg = render_config_from_cfg(
                self.cfg,
                sfm_level=-1,
                fine_level=self.train_level if with_fine else -1,
                nerf_far_override=False,
            )
            step = make_train_step(self.fc, rcfg, self.lcfg, self.opt,
                                   self.anneal_end, self.ray_mask_ids)
            self._steps[key] = jit_train_step(step, self.mesh, donate=True)
        return self._steps[key]

    def refine_surface(self):
        """octree_update (reference neuconw_system.py:268-312)."""
        host, dev = octree_update(
            jax.device_get(self.state.params), self.fc, self.sfm_grid,
            self.meta.scene_config,
            np.asarray(self.meta.scene_config["origin"], np.float64),
            float(self.meta.scene_config["radius"]),
            float(self.cfg.NEUCONW.TRAIN_VOXEL_SIZE),
            self.sdf_threshold, self.mesh,
        )
        if host is not None:
            self.fine_grid_host, self.fine_dgrid = host, dev
            self._attach_pool_surface()

    def _attach_pool_surface(self):
        """Refresh the pool's precomputed surface band (one exact DDA
        sweep per octree_update, amortized over the refresh interval —
        the step then reads the band instead of traversing the grid)."""
        if self.device_pool is not None and self.fine_dgrid is not None:
            self.device_pool.attach_surface(self.fine_dgrid, self.train_level)

    # ------------------------------ loop ------------------------------

    def fit(self, pool: RayPool | None = None, max_steps: int | None = None):
        pool = pool or self.load_rays()
        if len(pool) == 0:
            raise ValueError(
                "ray pool is empty — the cache holds no rays (all rays may "
                "have missed the scene voxels during cache generation); "
                "check the workspace/splits under DATASET.ROOT_DIR")
        bs = self.tcfg.batch_size
        steps_per_epoch = max(pool.epoch_batches(bs), 1)
        total = self.tcfg.num_epochs * steps_per_epoch
        if max_steps is not None:
            total = min(total, int(self.state.step) + max_steps)
        val_every = self.tcfg.val_freq_steps or val_interval(
            float(self.cfg.TRAINER.VAL_FREQ), steps_per_epoch
        )

        rng = jax.random.PRNGKey(int(self.cfg.TRAINER.SEED) + 1)
        data_rng = jax.random.PRNGKey(int(self.cfg.TRAINER.SEED) + 2)

        use_device_pool = getattr(self.cfg.TPU, "DEVICE_POOL", "auto")
        if use_device_pool == "auto":
            from ..ops.pallas_mlp import on_tpu

            use_device_pool = on_tpu()
        device_pool = None
        if use_device_pool:
            from ..datasets.cache import DeviceRayPool

            device_pool = DeviceRayPool(
                pool, self.mesh,
                sampling=str(getattr(self.cfg.TPU, "POOL_SAMPLING", "epoch")),
                seed=int(self.cfg.TRAINER.SEED) + 3,
            )
        self.device_pool = device_pool
        # resume past the first octree_update: band cache for the
        # restored fine grid
        self._attach_pool_surface()

        # scan fast path: N steps per dispatch when the pool lives on a
        # single data shard (amortizes dispatch latency; essential over
        # a TPU tunnel, harmless locally)
        scan_inner = int(getattr(self.cfg.TPU, "SCAN_INNER", 50))
        use_scan = (
            device_pool is not None
            and device_pool.n_shards == 1
            and scan_inner > 1
        )
        if use_scan and device_pool.sampling == "epoch":
            # a scan window consumes scan_inner consecutive epoch
            # batches; cap it so one window fits inside an epoch of a
            # small pool (tiny fixtures), degrading to per-step below 2
            scan_inner = min(scan_inner, device_pool.rows_per_shard // bs)
            use_scan = scan_inner > 1

        t0 = time.time()
        profiling = False
        # host mirror of the device step counter: the loop must not
        # force a device sync per iteration (over a TPU tunnel that
        # round-trip would dominate the step time)
        step_i = int(self.state.step)
        # windowed throughput: rate since the previous scalar log, not a
        # cumulative average (which would fold jit compiles, validation
        # and surface refreshes into every later reading)
        win_t, win_step = t0, step_i
        while step_i < total:
            if self.tcfg.profile_start >= 0:
                if step_i == self.tcfg.profile_start and not profiling:
                    jax.profiler.start_trace(os.path.join(self.exp_dir, "profile"))
                    profiling = True
                elif profiling and step_i >= self.tcfg.profile_start + self.tcfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
            if self.update_freq > 0 and step_i > 0 and step_i % self.update_freq == 0:
                self.refine_surface()

            with_fine = self.fine_dgrid is not None

            # steps until the next host-side boundary (refine/save/val/
            # profile edge/total)
            boundaries = [total]
            for freq in (self.update_freq, self.save_freq, val_every):
                if freq > 0:
                    boundaries.append((step_i // freq + 1) * freq)
            if self.tcfg.profile_start >= 0:
                for edge in (self.tcfg.profile_start,
                             self.tcfg.profile_start + self.tcfg.profile_steps):
                    if edge > step_i:
                        boundaries.append(edge)
            room = min(boundaries) - step_i

            if use_scan and room >= scan_inner:
                run = self._get_scan_run(with_fine, bs, scan_inner)
                perm, start = device_pool.take_scan_window(bs, scan_inner)
                self.state, aux = run(
                    self.state, self.scene, device_pool.data, data_rng, rng,
                    self.fine_dgrid, self.sfm_dgrid, perm, start,
                )
                step_i += scan_inner
            else:
                if device_pool is not None:
                    batch = device_pool.next_batch(
                        jax.random.fold_in(data_rng, step_i), bs
                    )
                else:
                    batch = shard_rays(self.mesh, {
                        k: jnp.asarray(v) for k, v in pool.next_batch(bs).items()
                    })
                jstep = self._get_step(with_fine)
                self.state, aux = jstep(self.state, self.scene, batch, rng,
                                        self.fine_dgrid, self.sfm_dgrid)
                step_i += 1

            if step_i % 50 == 0 or step_i >= total:
                scalars = {k: float(v) for k, v in aux.items()}  # sync here only
                now = time.time()
                scalars["rays_per_sec"] = (
                    bs * (step_i - win_step) / max(now - win_t, 1e-9)
                )
                win_t, win_step = now, step_i
                self.logger.log(step_i, scalars)
            if self.save_freq > 0 and step_i % self.save_freq == 0:
                self.save(step_i)
            if val_every > 0 and step_i % val_every == 0 and self.meta.img_ids_train:
                self.validate(step_i)
                win_t = time.time()  # keep val render time out of the window
        if profiling:
            jax.profiler.stop_trace()
        self.save(step_i)
        return self.state

    def _get_scan_run(self, with_fine: bool, batch_size: int, n_inner: int):
        key = ("scan_fine" if with_fine else "scan_warm", batch_size, n_inner)
        if key not in self._steps:
            from .step import make_scan_train_fn

            rcfg = render_config_from_cfg(
                self.cfg, sfm_level=-1,
                fine_level=self.train_level if with_fine else -1,
                nerf_far_override=False,
            )
            self._steps[key] = make_scan_train_fn(
                self.fc, rcfg, self.lcfg, self.opt, self.anneal_end,
                self.ray_mask_ids, batch_size, n_inner,
            )
        return self._steps[key]

    def save(self, step: int):
        # all processes must call: orbax's save is a collective in
        # multihost runs (writes happen on the primary host only).
        # Multihost therefore requires a SHARED save_dir.
        save_checkpoint(self.ckpt_dir, step, jax.device_get(self.state.params),
                        jax.device_get(self.state.opt_state),
                        fine_grid=self.fine_grid_host,
                        config_snapshot=str(self.cfg))

    def validate(self, step: int) -> dict:
        from .validation import validation_report

        with_fine = self.fine_dgrid is not None
        key = "val_fine" if with_fine else "val_warm"
        if key not in self._steps:
            rcfg = render_config_from_cfg(
                self.cfg, sfm_level=self.sfm_grid.level,
                fine_level=self.train_level if with_fine else -1,
                nerf_far_override=bool(self.cfg.NEUCONW.NEAR_FAR_OVERRIDE),
            )
            self._steps[key] = make_render_fn(self.fc, rcfg)
        if self._val_meta is None:
            # val images render at downscale >= 8 by default (reference
            # phototourism.py:70-71 forces this to avoid OOM on
            # megapixel photos); TRAINER.VAL_DOWNSCALE overrides for
            # small images where /8 wrecks the metric
            from ..utils.scene import val_downscale

            self._val_meta = load_scene_meta(
                self.cfg.DATASET.ROOT_DIR, val_downscale(self.cfg),
                sfm_path=self.meta.sfm_path,
            )
        val_id = self._val_meta.img_ids_train[0]  # reference phototourism.py:695
        # shard the render over the data axis only when the chunk
        # divides it — otherwise fall back to single-device (a config
        # choice must never kill the training run at validation time).
        # Multi-process runs render replicated-redundant instead: every
        # process computes the same image and only main writes — the
        # reference's own multi-GPU validation semantics ("validate same
        # image for all gpus", reference datasets/phototourism.py:57)
        multiproc = getattr(self.mesh, "is_multi_process", False)
        n_data = int(self.mesh.shape.get("data", 1))
        val_mesh = (self.mesh if (self.tcfg.test_batch_size % n_data == 0
                                  and not multiproc) else None)
        val_params = (jax.device_get(self.state.params) if multiproc
                      else self.state.params)
        metrics = validation_report(
            self._steps[key], val_params, self.scene, self._val_meta,
            val_id, chunk=self.tcfg.test_batch_size,
            fine_grid=self.fine_dgrid, sfm_grid=self.sfm_dgrid,
            out_dir=(os.path.join(self.exp_dir, "val")
                     if self.is_main else None),
            step=step,
            mesh=val_mesh,
        )
        metrics.update(self._inline_mesh_eval(step))
        self.logger.log(step, metrics)
        return metrics

    def _inline_mesh_eval(self, step: int, dim: int = 128) -> dict:
        """Validation-time mesh extraction + F-score vs gt.ply when the
        scan exists (reference neuconw_system.py:466-531)."""
        gt_path = os.path.join(self.cfg.DATASET.ROOT_DIR, "gt.ply")
        if not os.path.exists(gt_path):
            return {}
        from ..evaluation import eval_mesh_arrays, sample_mesh_surface, transform_points
        from ..evaluation.geometry import bbx_crop
        from ..extraction import box_eval_grid, extract_mesh
        from ..utils.ply import read_ply

        sc = self.meta.scene_config
        bbx = sc.get("eval_bbx_detail", sc["eval_bbx"])
        grid = box_eval_grid(bbx, dim)
        params = jax.device_get(self.state.params)
        origin = np.asarray(sc["origin"], np.float64)
        mesh = extract_mesh(params, self.fc, grid, origin, float(sc["radius"]),
                            mesh=self.mesh)
        if mesh is None:
            return {"val/fscore": 0.0}
        # the reference scores pred AND GT cropped to eval_bbx_detail
        # (reference neuconw_system.py:517-527 -> eval_mesh bbx crop);
        # without the GT crop, geometry outside the detail box deflates
        # recall
        gt = bbx_crop(read_ply(gt_path)["verts"], bbx)
        if len(gt) == 0:
            return {"val/fscore": 0.0}
        pred = bbx_crop(transform_points(
            sample_mesh_surface(mesh.verts, mesh.faces, min(len(gt) * 2, 200000)),
            np.asarray(sc["sfm2gt"]),
        ), bbx)
        m = eval_mesh_arrays(pred, gt, threshold=0.1)
        return {"val/fscore": m["fscore"]}
