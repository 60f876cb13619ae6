"""Pre-bench setup for bench.py's realistic-geometry phase.

bench.py never builds scene artifacts inside its bounded window any
more (the round-4 driver bench died mid-setup and recorded nothing);
this script produces them ahead of time:

  synthetic COLMAP workspace -> ray cache -> 300-step flagship training
  through the production Trainer -> octree_update fine grid from the
  trained SDF -> fine_grid_l{L}_s{steps}.npz

Run it once on the chip (or CPU with NW_BENCH_SCENE_TINY=1):

    python scripts/prep_bench_scene.py                 # build at NW_BENCH_SCENE_DIR
    python scripts/prep_bench_scene.py --copy_assets   # + commit-ready copy
                                                       #   under assets/bench_scene

With --copy_assets the minimal read-path artifacts (config.yaml,
cache_sgs/splits, the grid npz) are copied into <repo>/assets/
bench_scene, which bench.py falls back to when NW_BENCH_SCENE_DIR has
nothing — so a fresh container still measures the steady_scene phase.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=None,
                    help="grid level (default: bench.py's "
                         "NW_BENCH_SCENE_LEVEL / NW_BENCH_FINE_LEVEL)")
    ap.add_argument("--copy_assets", action="store_true",
                    help="copy the read-path artifacts into "
                         "assets/bench_scene for committing")
    args = ap.parse_args()

    import bench

    level = args.level if args.level is not None else int(
        os.environ.get("NW_BENCH_SCENE_LEVEL", bench.FINE_LEVEL))
    ssc, host, _, pool = bench.scene_geometry(
        level, min(bench.BATCH, 2048), allow_build=True)
    ws = os.environ.get("NW_BENCH_SCENE_DIR", "/root/nw_bench_scene")
    steps = int(os.environ.get("NW_BENCH_SCENE_STEPS", "300"))
    tiny = os.environ.get("NW_BENCH_SCENE_TINY", "0") == "1"
    grid_name = f"fine_grid_l{level}_s{steps}{'_tiny' if tiny else ''}.npz"
    print(f"scene ready: {ws} grid={grid_name} "
          f"voxels={host.coords.shape[0]} rays={len(pool)}")

    if args.copy_assets:
        assets = os.path.join(REPO, "assets", "bench_scene")
        os.makedirs(assets, exist_ok=True)
        shutil.copy2(os.path.join(ws, "config.yaml"), assets)
        shutil.copy2(os.path.join(ws, grid_name), assets)
        dst = os.path.join(assets, "cache_sgs", "splits")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(os.path.join(ws, "cache_sgs", "splits"), dst)
        print(f"assets copied to {assets}")


if __name__ == "__main__":
    main()
