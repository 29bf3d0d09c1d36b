"""Headless Blender data generation (runs INSIDE Blender's python, not jax).

Equivalent of pixie/blender/generate_blendernerf_data.py (438 lines):
normalize a GLB to the unit cube, place N cameras on random spherical shells
(distance 1.2-1.8, the reference's config/data_rendering defaults), render
PNGs with Cycles and emit a NeRF-style transforms.json.  This version emits
transforms.json directly instead of relying on the BlenderNeRF addon.

Usage:
  blender --background --python pixie_tpu/blender/generate_blendernerf_data.py -- \
      --glb <asset.glb> --out <data/obj_id> --num-views 200 \
      --dist-min 1.2 --dist-max 1.8 --resolution 512
"""

import argparse
import json
import math
import os
import random
import sys


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    ap = argparse.ArgumentParser()
    ap.add_argument("--glb", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-views", type=int, default=200)
    ap.add_argument("--dist-min", type=float, default=1.2)
    ap.add_argument("--dist-max", type=float, default=1.8)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--fov-deg", type=float, default=47.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--samples", type=int, default=64)
    return ap.parse_args(argv)


def main():
    import bpy  # noqa: PLC0415  (only available inside Blender)
    from mathutils import Vector  # noqa: PLC0415

    args = parse_args()
    random.seed(args.seed)
    os.makedirs(args.out, exist_ok=True)

    # fresh scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    bpy.ops.import_scene.gltf(filepath=args.glb)

    # normalize union bbox to the unit cube centered at the origin
    meshes = [o for o in bpy.context.scene.objects if o.type == "MESH"]
    mins = Vector((1e9, 1e9, 1e9))
    maxs = Vector((-1e9, -1e9, -1e9))
    for o in meshes:
        for corner in o.bound_box:
            wc = o.matrix_world @ Vector(corner)
            mins = Vector(map(min, mins, wc))
            maxs = Vector(map(max, maxs, wc))
    center = (mins + maxs) / 2
    scale = 1.0 / max(max(maxs - mins), 1e-9)
    root = bpy.data.objects.new("pixie_root", None)
    bpy.context.scene.collection.objects.link(root)
    for o in bpy.context.scene.objects:
        if o is not root and o.parent is None:
            o.parent = root
    root.location = -center * scale
    root.scale = (scale, scale, scale)

    # camera + renderer
    cam_data = bpy.data.cameras.new("cam")
    cam_data.angle = math.radians(args.fov_deg)
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.cycles.samples = args.samples
    scene.render.resolution_x = scene.render.resolution_y = args.resolution
    scene.render.film_transparent = True
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"

    world = bpy.data.worlds.new("w")
    scene.world = world
    world.use_nodes = True
    world.node_tree.nodes["Background"].inputs[1].default_value = 1.0

    frames = []
    for i in range(args.num_views):
        # uniform direction on the sphere, random shell distance
        z = random.uniform(-1, 1)
        phi = random.uniform(0, 2 * math.pi)
        r = math.sqrt(max(1 - z * z, 0))
        d = random.uniform(args.dist_min, args.dist_max)
        pos = Vector((r * math.cos(phi) * d, r * math.sin(phi) * d, z * d))
        cam.location = pos
        look = -pos.normalized()
        cam.rotation_euler = look.to_track_quat("-Z", "Y").to_euler()
        bpy.context.view_layer.update()

        fname = f"r_{i:04d}.png"
        scene.render.filepath = os.path.join(args.out, fname)
        bpy.ops.render.render(write_still=True)
        frames.append(
            {
                "file_path": fname,
                "transform_matrix": [list(row) for row in cam.matrix_world],
            }
        )

    transforms = {"camera_angle_x": cam_data.angle, "frames": frames}
    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump(transforms, f, indent=2)
    # the reference also writes transforms_train.json (BlenderNeRF layout)
    with open(os.path.join(args.out, "transforms_train.json"), "w") as f:
        json.dump(transforms, f, indent=2)
    print(f"rendered {args.num_views} views -> {args.out}")


if __name__ == "__main__":
    main()
