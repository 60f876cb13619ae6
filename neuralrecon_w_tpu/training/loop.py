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
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.cache import RayPool, local_split_names, read_ray_cache
from ..datasets.mask_utils import get_label_id_mapping
from ..datasets.phototourism import SCENE_DEFAULTS, load_scene_meta
from ..models.neuconw import field_config_from_cfg
from ..ops.ray_voxel import device_grid_from_host
from ..ops.voxel_grid import VoxelGrid, grid_from_sfm_points
from ..parallel.mesh import make_mesh, shard_rays
from ..rendering.renderer import SceneInfo, render_config_from_cfg
from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from .losses import loss_config_from_cfg
from .schedule import make_optimizer
from .step import init_state, jit_train_step, make_render_fn, make_train_step
from .surface import octree_update, surface_level


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


@dataclass
class TrainerConfig:
    batch_size: int = 2048
    num_epochs: int = 20
    test_batch_size: int = 512
    exp_name: str = "exp"
    save_dir: str = "results"
    ckpt_path: str | None = None
    val_freq_steps: int | None = None  # default: VAL_FREQ fraction of epoch


class Trainer:
    """End-to-end single-controller trainer for one scene."""

    def __init__(self, cfg, tcfg: TrainerConfig, mesh=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = int(np.prod(self.mesh.devices.shape))
        self.world_batch = tcfg.batch_size * 1  # rays are global, sharded

        root = cfg.DATASET.ROOT_DIR
        scene_name = os.path.basename(os.path.normpath(root))
        defaults = SCENE_DEFAULTS.get(scene_name, {})
        sfm_path = cfg.DATASET.PHOTOTOURISM.SFM_PATH or defaults.get("sfm_path", "sparse")
        self.meta = load_scene_meta(root, cfg.DATASET.PHOTOTOURISM.IMG_DOWNSCALE,
                                    sfm_path=sfm_path)
        sc = self.meta.scene_config
        self.scene = SceneInfo(
            origin=jnp.asarray(sc["origin"], jnp.float32),
            radius=jnp.asarray(float(sc["radius"]), jnp.float32),
            sfm2gt=jnp.asarray(sc["sfm2gt"], jnp.float32),
        )

        # SFM occupancy grid (validation near/far override + surface init)
        self.sfm_grid = grid_from_sfm_points(
            sc, self.meta.points3d, sc["min_track_length"], sc["voxel_size"],
            expand=1, radius=1.0,
        )
        self.sfm_dgrid = device_grid_from_host(self.sfm_grid)
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

        self.exp_dir = os.path.join(tcfg.save_dir, tcfg.exp_name)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        self.logger = MetricsLogger(os.path.join(self.exp_dir, "logs"))

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
                self.fine_dgrid = device_grid_from_host(self.fine_grid_host)

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

    # ------------------------------ loop ------------------------------

    def fit(self, pool: RayPool | None = None, max_steps: int | None = None):
        pool = pool or self.load_rays()
        bs = self.tcfg.batch_size
        steps_per_epoch = max(pool.epoch_batches(bs), 1)
        total = self.tcfg.num_epochs * steps_per_epoch
        if max_steps is not None:
            total = min(total, int(self.state.step) + max_steps)
        val_every = self.tcfg.val_freq_steps or max(
            int(steps_per_epoch * float(self.cfg.TRAINER.VAL_FREQ)), 1
        )

        rng = jax.random.PRNGKey(int(self.cfg.TRAINER.SEED) + 1)
        t0 = time.time()
        while int(self.state.step) < total:
            step_i = int(self.state.step)
            if self.update_freq > 0 and step_i > 0 and step_i % self.update_freq == 0:
                self.refine_surface()

            batch = shard_rays(self.mesh, {
                k: jnp.asarray(v) for k, v in pool.next_batch(bs).items()
            })
            with_fine = self.fine_dgrid is not None
            jstep = self._get_step(with_fine)
            self.state, aux = jstep(self.state, self.scene, batch, rng,
                                    self.fine_dgrid, self.sfm_dgrid)

            step_i = int(self.state.step)
            if step_i % 50 == 0 or step_i == total:
                scalars = {k: v for k, v in aux.items()}
                scalars["rays_per_sec"] = bs * step_i / max(time.time() - t0, 1e-9)
                self.logger.log(step_i, scalars)
            if self.save_freq > 0 and step_i % self.save_freq == 0:
                self.save(step_i)
            if val_every > 0 and step_i % val_every == 0 and self.meta.img_ids_train:
                self.validate(step_i)
        self.save(int(self.state.step))
        return self.state

    def save(self, step: int):
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
            # val images render at downscale >= 8 (reference
            # phototourism.py:70-71 forces this to avoid OOM)
            self._val_meta = load_scene_meta(
                self.cfg.DATASET.ROOT_DIR,
                max(8, int(self.cfg.DATASET.PHOTOTOURISM.IMG_DOWNSCALE)),
                sfm_path=self.meta.sfm_path,
            )
        val_id = self._val_meta.img_ids_train[0]  # reference phototourism.py:695
        metrics = validation_report(
            self._steps[key], self.state.params, self.scene, self._val_meta,
            val_id, chunk=self.tcfg.test_batch_size,
            fine_grid=self.fine_dgrid, sfm_grid=self.sfm_dgrid,
            out_dir=os.path.join(self.exp_dir, "val"), step=step,
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
        from ..extraction import box_eval_grid, extract_mesh
        from ..utils.ply import read_ply

        sc = self.meta.scene_config
        grid = box_eval_grid(sc.get("eval_bbx_detail", sc["eval_bbx"]), dim)
        params = jax.device_get(self.state.params)
        origin = np.asarray(sc["origin"], np.float64)
        mesh = extract_mesh(params, self.fc, grid, origin, float(sc["radius"]),
                            mesh=self.mesh)
        if mesh is None:
            return {"val/fscore": 0.0}
        gt = read_ply(gt_path)["verts"]
        pred = transform_points(
            sample_mesh_surface(mesh.verts, mesh.faces, min(len(gt) * 2, 200000)),
            np.asarray(sc["sfm2gt"]),
        )
        m = eval_mesh_arrays(pred, gt, threshold=0.1)
        return {"val/fscore": m["fscore"]}
