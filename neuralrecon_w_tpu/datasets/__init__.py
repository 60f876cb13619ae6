from .cache import (
    RayPool,
    local_split_names,
    read_ray_cache,
    write_ray_cache,
)
from .colmap import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    rotmat2qvec,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)
from .phototourism import (
    SceneMeta,
    apply_voxel_near_far,
    build_image_rays,
    load_scene_config,
    load_scene_meta,
    oversample_depth_rays,
)
from .rays import get_ray_directions, get_rays

__all__ = [
    "RayPool", "local_split_names", "read_ray_cache", "write_ray_cache",
    "Camera", "Image", "Point3D", "qvec2rotmat", "rotmat2qvec",
    "read_cameras_binary", "read_images_binary", "read_points3d_binary",
    "write_cameras_binary", "write_images_binary", "write_points3d_binary",
    "SceneMeta", "apply_voxel_near_far", "build_image_rays",
    "load_scene_config", "load_scene_meta", "oversample_depth_rays",
    "get_ray_directions", "get_rays",
]
