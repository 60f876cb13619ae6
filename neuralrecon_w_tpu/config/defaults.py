"""Default configuration tree.

Schema-compatible with the reference's yacs defaults (reference
config/defaults.py:4-121) so the per-scene training YAMLs
(config/train_*.yaml) load unchanged. TPU-specific knobs live under
``TRAINER`` / ``TPU`` and have conservative defaults.
"""

from .node import CfgNode as CN

_CN = CN()

# --------------------------- NeuS-W pipeline ---------------------------
_CN.NEUCONW = CN()
_CN.NEUCONW.N_SAMPLES = 512
_CN.NEUCONW.N_IMPORTANCE = 512
_CN.NEUCONW.USE_DISP = False
_CN.NEUCONW.PERTURB = 1.0
_CN.NEUCONW.NOISE_STD = 1.0

_CN.NEUCONW.S_VAL_BASE = 0
_CN.NEUCONW.BOUNDARY_SAMPLES = 0
_CN.NEUCONW.NEAR_FAR_OVERRIDE = False
_CN.NEUCONW.VOXEL_SIZE = 0.0
_CN.NEUCONW.MIN_TRACK_LENGTH = 0
_CN.NEUCONW.SAMPLE_RANGE = 4
_CN.NEUCONW.SDF_THRESHOLD = 1e-3
_CN.NEUCONW.TRAIN_VOXEL_SIZE = 0.01
_CN.NEUCONW.UPDATE_FREQ = 2000

_CN.NEUCONW.N_VOCAB = 1500
_CN.NEUCONW.ENCODE_A = True
_CN.NEUCONW.N_A = 48
_CN.NEUCONW.N_STATIC_HEAD = 1
_CN.NEUCONW.ANNEAL_END = 50000

_CN.NEUCONW.RENDER_BG = True
_CN.NEUCONW.UP_SAMPLE_STEP = 4
_CN.NEUCONW.N_OUTSIDE = 32
_CN.NEUCONW.MESH_MASK_LIST = None
_CN.NEUCONW.RAY_MASK_LIST = None
_CN.NEUCONW.ENCODE_A_BG = True
_CN.NEUCONW.FLOOR_NORMAL = False
_CN.NEUCONW.FLOOR_LABELS = ["road"]
_CN.NEUCONW.DEPTH_LOSS = False

# SDF (geometry) MLP — reference models/neuconw.py:183-296
_CN.NEUCONW.SDF_CONFIG = CN()
_CN.NEUCONW.SDF_CONFIG.d_in = 3
_CN.NEUCONW.SDF_CONFIG.d_out = 513
_CN.NEUCONW.SDF_CONFIG.d_hidden = 512
_CN.NEUCONW.SDF_CONFIG.n_layers = 8
_CN.NEUCONW.SDF_CONFIG.skip_in = (4,)
_CN.NEUCONW.SDF_CONFIG.multires = 6
_CN.NEUCONW.SDF_CONFIG.bias = 0.5
_CN.NEUCONW.SDF_CONFIG.scale = 1
_CN.NEUCONW.SDF_CONFIG.geometric_init = True
_CN.NEUCONW.SDF_CONFIG.weight_norm = True
_CN.NEUCONW.SDF_CONFIG.inside_outside = False

# color MLP — reference models/neuconw.py:59-170
_CN.NEUCONW.COLOR_CONFIG = CN()
_CN.NEUCONW.COLOR_CONFIG.d_in = 9
_CN.NEUCONW.COLOR_CONFIG.d_feature = 512
_CN.NEUCONW.COLOR_CONFIG.mode = "idr"
_CN.NEUCONW.COLOR_CONFIG.d_out = 3
_CN.NEUCONW.COLOR_CONFIG.d_hidden = 256
_CN.NEUCONW.COLOR_CONFIG.n_layers = 4
_CN.NEUCONW.COLOR_CONFIG.head_channels = 128
_CN.NEUCONW.COLOR_CONFIG.static_head_layers = 2
_CN.NEUCONW.COLOR_CONFIG.weight_norm = True
_CN.NEUCONW.COLOR_CONFIG.multires_view = 4

# learned single variance — reference models/neuconw.py:173-179
_CN.NEUCONW.S_CONFIG = CN()
_CN.NEUCONW.S_CONFIG.init_val = 0.03

# loss weights — reference losses.py:11-18
_CN.NEUCONW.LOSS = CN()
_CN.NEUCONW.LOSS.coef = 1.0
_CN.NEUCONW.LOSS.igr_weight = 0.1
_CN.NEUCONW.LOSS.mask_weight = 0.1
_CN.NEUCONW.LOSS.depth_weight = 0.1
_CN.NEUCONW.LOSS.floor_weight = 0.01
# The reference silently uses depth_weight for the floor loss
# (losses.py:17). Parity mode keeps that behavior; set False to honor
# floor_weight as configured.
_CN.NEUCONW.LOSS.replicate_floor_weight_bug = True

# ------------------------------- dataset -------------------------------
_CN.DATASET = CN()
_CN.DATASET.ROOT_DIR = None
_CN.DATASET.DATASET_NAME = None
_CN.DATASET.SPLIT = "train"

_CN.DATASET.PHOTOTOURISM = CN()
_CN.DATASET.PHOTOTOURISM.IMG_DOWNSCALE = 1
_CN.DATASET.PHOTOTOURISM.USE_CACHE = True
_CN.DATASET.PHOTOTOURISM.CACHE_DIR = "cache_sgs"
_CN.DATASET.PHOTOTOURISM.CACHE_TYPE = "npz"
_CN.DATASET.PHOTOTOURISM.SEMANTIC_MAP_PATH = "semantic_maps"
_CN.DATASET.PHOTOTOURISM.WITH_SEMANTICS = True
# SFM depth supervision source/oversampling, promoted to config (the
# reference hardcodes these per scene in datasets/phototourism.py:82-93).
_CN.DATASET.PHOTOTOURISM.SFM_PATH = "sparse"
_CN.DATASET.PHOTOTOURISM.DEPTH_PERCENT = -1.0  # <0 => per-scene default

# ------------------------------- trainer -------------------------------
_CN.TRAINER = CN()
_CN.TRAINER.WORLD_SIZE = 1
_CN.TRAINER.TRUE_BATCH_SIZE = None
_CN.TRAINER.CANONICAL_BS = 2048
_CN.TRAINER.CANONICAL_LR = 1e-3
_CN.TRAINER.SCALING = None
_CN.TRAINER.SAVE_DIR = "checkpoints"
_CN.TRAINER.VAL_FREQ = 0.125
# validation-render downscale; -1 = the reference rule max(8,
# IMG_DOWNSCALE) (reference phototourism.py:70-71, an OOM guard for
# megapixel photos). Set explicitly for small images — the forced /8
# turns a 64x48 synthetic view into 8x6 px and wrecks val/psnr (16 vs
# 27 at downscale 2 on the same checkpoint, BENCHMARKS.md).
_CN.TRAINER.VAL_DOWNSCALE = -1
_CN.TRAINER.SAVE_FREQ = 5000

_CN.TRAINER.OPTIMIZER = "adam"
_CN.TRAINER.LR = None
_CN.TRAINER.WEIGHT_DECAY = 0

_CN.TRAINER.WARMUP_EPOCHS = 0
_CN.TRAINER.WARMUP_MULTIPLIER = 1.0

_CN.TRAINER.LR_SCHEDULER = "cosine"  # ['steplr', 'cosine', 'poly', 'none']
_CN.TRAINER.DECAY_STEP = []
_CN.TRAINER.DECAY_GAMMA = 0.1
_CN.TRAINER.POLY_EXP = 0.9

_CN.TRAINER.SEED = 66
_CN.TRAINER.GRAD_CLIP = 0.99  # global-norm clip (reference train.py:61)

# ----------------------------- TPU runtime -----------------------------
_CN.TPU = CN()
_CN.TPU.MESH_DATA = -1  # -1 => all devices on the data axis
_CN.TPU.MESH_MODEL = 1
_CN.TPU.DONATE_STATE = True
# "auto" (on when running on TPU) | True | False — run the WHOLE
# importance-sampling stage as one fused Pallas kernel
# (ops/pallas_sampler.py): MLP evals + up-sampling + inverse-CDF +
# merges. 2.5x on the stage vs the jnp path (BENCHMARKS.md).
_CN.TPU.FUSED_SAMPLER_SDF = "auto"
# "auto" (on when running on TPU) | True | False — keep the whole ray
# pool in HBM and gather batches on device (with-replacement sampling;
# removes the per-step host->device copy)
_CN.TPU.DEVICE_POOL = "auto"
# 'epoch' | 'replacement' — batch selection of the HBM-resident pool.
# 'epoch' (default) = shuffled without-replacement epochs from a
# device-resident permutation, the SAME data statistics as the host
# RayPool and the reference's DataLoader(shuffle=True); 'replacement'
# = stateless per-step randint gather (round-2's behavior).
_CN.TPU.POOL_SAMPLING = "epoch"
# steps fused per dispatch via lax.scan when the device pool is active
# (single data shard); amortizes host dispatch latency
_CN.TPU.SCAN_INNER = 50
# False | True | a jax.checkpoint_policies name (str). True saves
# nothing (costs ~15% step time at batch 8192; fits larger ray
# batches); a policy name like 'dots_saveable' keeps MXU outputs and
# recomputes only the elementwise chain in backward.
_CN.TPU.REMAT_FIELD = False
# per-sample SDF gradient mode: 'vjp' (fused reverse) | 'fwd'
# (linearize + 3 tangents; reverse-over-forward backward)
_CN.TPU.SDF_GRAD_MODE = "vjp"
# 'float32' | 'bfloat16' — dtype of field hidden activations. The step
# is HBM-bound on stored activations (BENCHMARKS.md); bfloat16 halves
# that traffic (weights stay f32). Default f32 for exact parity.
_CN.TPU.FIELD_DTYPE = "float32"
# True | False — evaluate the background NeRF through the fused Pallas
# forward + single-call custom-VJP backward (ops/pallas_nerf_bg.py)
# instead of XLA. Measured SLOWER on v5e (micro fwd+bwd 40.9 ms vs
# XLA's 26.6 ms at 311k pts, bf16): the 256-wide layers make tiny
# per-tile GEMMs while XLA runs giant batched ones — the bg pass is
# MXU-shape-bound, not HBM-bound (BENCHMARKS.md). Kept as a verified
# alternative mode; default off.
_CN.TPU.FUSED_BG = False
# > 0: evaluate the background NeRF at only this many coarse positions
# along each ray (a static stride over the sorted fg z) PLUS the
# N_OUTSIDE tail (always exact), expanding density/color to the full
# sample set by nearest-index piecewise-constant interpolation before
# compositing. The reference evaluates bg at ALL sorted fg z
# (reference rendering/renderer.py:157-228) although the fg/bg merge
# masks its contribution to zero at every inside-sphere sample — in the
# steady (surface-guided) phase that is most of them. -1 = reference
# behavior (evaluate everywhere). Quality-ablated (BENCHMARKS.md).
_CN.TPU.BG_SAMPLES = -1
# >= 0: override NEUCONW.BOUNDARY_SAMPLES in the steady (surface-guided)
# phase. The reference pads the surface band with 10 extra full-field
# samples split between [near, band) and (band, far] "to ensure boundary
# doesn't have noisy surface" (reference rendering/renderer.py:549-567);
# they dominate the steady-phase fg cost (each boundary sample runs the
# full SDF-with-gradient + color stack). -1 = reference budget.
# Quality-ablated like BG_SAMPLES (BENCHMARKS.md).
_CN.TPU.BOUNDARY_SAMPLES = -1
# point-tile override for the fused field kernels (-1 = measured
# per-width defaults). Tiles > 128 at d_hidden 512 need a raised
# device scoped-VMEM limit (jit compiler_options
# xla_tpu_scoped_vmem_limit_kib; host XLA_FLAGS rejects --xla_tpu_*
# under the remote-device tunnel) for the VMEM stacks.
_CN.TPU.KERNEL_TILE = -1
# ray-tile override for the fused importance-sampler kernel (-1 = 64)
_CN.TPU.SAMPLER_TILE = -1
# 'lanes' | 'rows' — axis layout of the sampler kernel's per-ray VPU
# logic. 'lanes' puts a full 128-ray tile on the lane axis (z samples
# on sublanes), fixing the <25% lane utilization of 'rows' at n<=32
# samples: 89.2k -> 91.7k rays/s on the headline bench (BENCHMARKS.md)
_CN.TPU.SAMPLER_LAYOUT = "lanes"
# surface-guided sampling's first-hit query against the online fine
# grid: 'sampled' (default) replaces the exact DDA while_loop with one
# dense occupancy gather over [near, far] — sub-voxel band placement at
# a fraction of the latency; 'dda' restores the exact march
_CN.TPU.SURFACE_QUERY = "sampled"
_CN.TPU.SURFACE_QUERY_SAMPLES = 1024


def get_cfg_defaults():
    """Return a fresh clone of the default config tree."""
    return _CN.clone()
