"""Scene flattening + procedural scene builders.

`scene_from_mesh` is the TPU-native replacement for the reference's two
flatteners (`flatten_scene`, src/simplify/flatten.cpp:50-82, and
`flatten_scene_ispc`, src/simplify/flatten_iscp.cpp:35-111): nested
per-geometry data becomes one padded SoA triangle table with per-triangle
material and a compacted light-face table. Unlike the reference we do not
sort by centroid-x (that sort only served its BVH median split) and we pad
all tables to static, tile-friendly shapes.

The procedural builders cover the BASELINE.json configs (sphere+plane,
10-sphere, ~10k-triangle mesh, mixed, 100k-primitive) — capabilities the
reference's models/ directory provides only via Cornell-box OBJ data.
`cornell_box()` reconstructs the canonical public-domain Cornell geometry
(Guedis Cardenas & Morgan McGuire, Williams College 2011; the same data as
the reference's models/cornell/CornellBox-Original.obj) so golden tests can
run without copying reference files.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from esctp1raytracer_tpu.scene.types import (
    DEFAULT_PAD_MULTIPLE,
    LightTable,
    Material,
    MeshData,
    Scene,
    SphereBuffer,
    TriangleBuffer,
    pad_to,
)


def scene_from_mesh(
    meshes: Sequence[MeshData],
    spheres: Optional[SphereBuffer] = None,
    pad_multiple: int = DEFAULT_PAD_MULTIPLE,
) -> Scene:
    """Flatten loaded geometries into a padded Scene pytree."""
    total = sum(m.num_faces for m in meshes)
    if total == 0:
        raise ValueError("scene has no triangles")
    capacity = pad_to(total, pad_multiple)

    v = np.zeros((capacity, 3, 3), np.float32)
    n = np.zeros((capacity, 3, 3), np.float32)
    has_normals = np.zeros((capacity,), bool)
    uv = np.zeros((capacity, 3, 2), np.float32)
    has_uv = np.zeros((capacity,), bool)
    ka = np.zeros((capacity, 3), np.float32)
    kd = np.zeros((capacity, 3), np.float32)
    ks = np.zeros((capacity, 3), np.float32)
    ke = np.zeros((capacity, 3), np.float32)
    ns = np.ones((capacity,), np.float32)
    is_light = np.zeros((capacity,), bool)
    geom_id = np.full((capacity,), -1, np.int32)
    prim_id = np.full((capacity,), -1, np.int32)
    valid = np.zeros((capacity,), bool)

    light_faces: List[List[int]] = []

    cursor = 0
    for gi, mesh in enumerate(meshes):
        f = mesh.num_faces
        sl = slice(cursor, cursor + f)
        v[sl] = mesh.vertices
        if mesh.normals is not None:
            n[sl] = mesh.normals
            has_normals[sl] = True
        if mesh.uv is not None:
            uv[sl] = mesh.uv
            has_uv[sl] = True
        mat = mesh.material
        ka[sl] = mat.ka
        kd[sl] = mat.kd
        ks[sl] = mat.ks
        ke[sl] = mat.ke
        ns[sl] = mat.ns
        geom_id[sl] = gi
        prim_id[sl] = np.arange(f, dtype=np.int32)
        valid[sl] = True
        if mat.is_light:
            # One light *source* per emissive geometry, exactly like
            # scene.light_sources (reference src/scene/sceneloader.cpp:101-103).
            is_light[sl] = True
            light_faces.append(list(range(cursor, cursor + f)))
        cursor += f

    if light_faces:
        max_faces = max(len(lf) for lf in light_faces)
        tri_idx = np.zeros((len(light_faces), max_faces), np.int32)
        face_count = np.zeros((len(light_faces),), np.int32)
        for li, lf in enumerate(light_faces):
            # Pad with repeats of the first face: padded slots are never
            # sampled (faceID is drawn modulo face_count) but stay in range.
            tri_idx[li] = lf[0]
            tri_idx[li, : len(lf)] = lf
            face_count[li] = len(lf)
        lights = LightTable(tri_idx=jnp.asarray(tri_idx), face_count=jnp.asarray(face_count))
    else:
        lights = LightTable.empty()

    triangles = TriangleBuffer(
        v0=jnp.asarray(v[:, 0]),
        v1=jnp.asarray(v[:, 1]),
        v2=jnp.asarray(v[:, 2]),
        n0=jnp.asarray(n[:, 0]),
        n1=jnp.asarray(n[:, 1]),
        n2=jnp.asarray(n[:, 2]),
        has_normals=jnp.asarray(has_normals),
        uv0=jnp.asarray(uv[:, 0]),
        uv1=jnp.asarray(uv[:, 1]),
        uv2=jnp.asarray(uv[:, 2]),
        has_uv=jnp.asarray(has_uv),
        ka=jnp.asarray(ka),
        kd=jnp.asarray(kd),
        ks=jnp.asarray(ks),
        ke=jnp.asarray(ke),
        ns=jnp.asarray(ns),
        is_light=jnp.asarray(is_light),
        geom_id=jnp.asarray(geom_id),
        prim_id=jnp.asarray(prim_id),
        valid=jnp.asarray(valid),
    )

    if spheres is None:
        spheres = SphereBuffer.empty(8)

    return Scene(triangles=triangles, spheres=spheres, lights=lights)


def make_spheres(
    centers: Sequence[Sequence[float]],
    radii: Sequence[float],
    materials: Sequence[Material],
    capacity: Optional[int] = None,
) -> SphereBuffer:
    s = len(radii)
    cap = capacity if capacity is not None else max(8, pad_to(s, 8))
    center = np.zeros((cap, 3), np.float32)
    radius = np.zeros((cap,), np.float32)
    ka = np.zeros((cap, 3), np.float32)
    kd = np.zeros((cap, 3), np.float32)
    ks = np.zeros((cap, 3), np.float32)
    ke = np.zeros((cap, 3), np.float32)
    ns = np.ones((cap,), np.float32)
    valid = np.zeros((cap,), bool)
    for i in range(s):
        center[i] = np.asarray(centers[i], np.float32)
        radius[i] = radii[i]
        ka[i], kd[i], ks[i], ke[i], ns[i] = (
            materials[i].ka, materials[i].kd, materials[i].ks,
            materials[i].ke, materials[i].ns,
        )
        valid[i] = True
    return SphereBuffer(
        center=jnp.asarray(center), radius=jnp.asarray(radius),
        ka=jnp.asarray(ka), kd=jnp.asarray(kd), ks=jnp.asarray(ks),
        ke=jnp.asarray(ke), ns=jnp.asarray(ns), valid=jnp.asarray(valid),
    )


def _quad_mesh(name: str, quad: Sequence[Sequence[float]], material: Material) -> MeshData:
    """Fan-triangulate one quad (v0,v1,v2 / v0,v2,v3) into a MeshData."""
    q = np.asarray(quad, np.float32)
    tris = np.stack([q[[0, 1, 2]], q[[0, 2, 3]]], axis=0)
    return MeshData(name=name, vertices=tris, normals=None, uv=None, material=material)


# --- Canonical Cornell box (public-domain data, Williams College 2011) ----

_CORNELL_MATERIALS = {
    "floor": Material.make(ka=(0.725, 0.71, 0.68), kd=(0.725, 0.71, 0.68), ns=10.0),
    "ceiling": Material.make(ka=(0.725, 0.71, 0.68), kd=(0.725, 0.71, 0.68), ns=10.0),
    "backWall": Material.make(ka=(0.725, 0.71, 0.68), kd=(0.725, 0.71, 0.68), ns=10.0),
    "rightWall": Material.make(ka=(0.14, 0.45, 0.091), kd=(0.14, 0.45, 0.091), ns=10.0),
    "leftWall": Material.make(ka=(0.63, 0.065, 0.05), kd=(0.63, 0.065, 0.05), ns=10.0),
    "shortBox": Material.make(ka=(0.725, 0.71, 0.68), kd=(0.725, 0.71, 0.68), ns=10.0),
    "tallBox": Material.make(ka=(0.725, 0.71, 0.68), kd=(0.725, 0.71, 0.68), ns=10.0),
    "light": Material.make(ka=(0.78, 0.78, 0.78), kd=(0.78, 0.78, 0.78),
                           ke=(17.0, 12.0, 4.0), ns=10.0),
}

_CORNELL_QUADS: List[Tuple[str, Tuple]] = [
    ("floor", ((-1.01, 0.0, 0.99), (1.0, 0.0, 0.99), (1.0, 0.0, -1.04), (-0.99, 0.0, -1.04))),
    ("ceiling", ((-1.02, 1.99, 0.99), (-1.02, 1.99, -1.04), (1.0, 1.99, -1.04), (1.0, 1.99, 0.99))),
    ("backWall", ((-0.99, 0.0, -1.04), (1.0, 0.0, -1.04), (1.0, 1.99, -1.04), (-1.02, 1.99, -1.04))),
    ("rightWall", ((1.0, 0.0, -1.04), (1.0, 0.0, 0.99), (1.0, 1.99, 0.99), (1.0, 1.99, -1.04))),
    ("leftWall", ((-1.01, 0.0, 0.99), (-0.99, 0.0, -1.04), (-1.02, 1.99, -1.04), (-1.02, 1.99, 0.99))),
    ("shortBox", ((0.53, 0.6, 0.75), (0.7, 0.6, 0.17), (0.13, 0.6, 0.0), (-0.05, 0.6, 0.57))),
    ("shortBox", ((-0.05, 0.0, 0.57), (-0.05, 0.6, 0.57), (0.13, 0.6, 0.0), (0.13, 0.0, 0.0))),
    ("shortBox", ((0.53, 0.0, 0.75), (0.53, 0.6, 0.75), (-0.05, 0.6, 0.57), (-0.05, 0.0, 0.57))),
    ("shortBox", ((0.7, 0.0, 0.17), (0.7, 0.6, 0.17), (0.53, 0.6, 0.75), (0.53, 0.0, 0.75))),
    ("shortBox", ((0.13, 0.0, 0.0), (0.13, 0.6, 0.0), (0.7, 0.6, 0.17), (0.7, 0.0, 0.17))),
    ("shortBox", ((0.53, 0.0, 0.75), (0.7, 0.0, 0.17), (0.13, 0.0, 0.0), (-0.05, 0.0, 0.57))),
    ("tallBox", ((-0.53, 1.2, 0.09), (0.04, 1.2, -0.09), (-0.14, 1.2, -0.67), (-0.71, 1.2, -0.49))),
    ("tallBox", ((-0.53, 0.0, 0.09), (-0.53, 1.2, 0.09), (-0.71, 1.2, -0.49), (-0.71, 0.0, -0.49))),
    ("tallBox", ((-0.71, 0.0, -0.49), (-0.71, 1.2, -0.49), (-0.14, 1.2, -0.67), (-0.14, 0.0, -0.67))),
    ("tallBox", ((-0.14, 0.0, -0.67), (-0.14, 1.2, -0.67), (0.04, 1.2, -0.09), (0.04, 0.0, -0.09))),
    ("tallBox", ((0.04, 0.0, -0.09), (0.04, 1.2, -0.09), (-0.53, 1.2, 0.09), (-0.53, 0.0, 0.09))),
    ("tallBox", ((-0.53, 0.0, 0.09), (0.04, 0.0, -0.09), (-0.14, 0.0, -0.67), (-0.71, 0.0, -0.49))),
    ("light", ((-0.24, 1.98, 0.16), (-0.24, 1.98, -0.22), (0.23, 1.98, -0.22), (0.23, 1.98, 0.16))),
]


def cornell_meshes(faithful_shapes: bool = True) -> List[MeshData]:
    """The Cornell-Original scene as MeshData.

    With faithful_shapes=True this reproduces the reference loader's shape
    grouping of CornellBox-Original.obj exactly — including the quirk that
    the shortBox quads precede the `g shortBox` statement and therefore land
    in the leftWall shape (red shortBox, white-material tallBox shape),
    matching tinyobj group semantics (reference src/scene/sceneloader.cpp:34,
    tiny_obj_loader.h group handling).
    """
    if not faithful_shapes:
        groups = {}
        order = []
        for name, quad in _CORNELL_QUADS:
            groups.setdefault(name, []).append(quad)
            if name not in order:
                order.append(name)
        out = []
        for name in order:
            tris = []
            for q in groups[name]:
                qa = np.asarray(q, np.float32)
                tris.append(qa[[0, 1, 2]])
                tris.append(qa[[0, 2, 3]])
            out.append(MeshData(name=name, vertices=np.stack(tris), normals=None,
                                uv=None, material=_CORNELL_MATERIALS[name]))
        return out

    # Faithful grouping: shapes as tinyobj splits them for this file —
    # walls are their own shapes; the leftWall shape also contains all
    # shortBox quads (material = leftWall, the first face's material); the
    # "shortBox" shape contains the tallBox quads (material = tallBox).
    shape_plan = [
        ("floor", ["floor"], "floor"),
        ("ceiling", ["ceiling"], "ceiling"),
        ("backWall", ["backWall"], "backWall"),
        ("rightWall", ["rightWall"], "rightWall"),
        ("leftWall", ["leftWall", "shortBox"], "leftWall"),
        ("shortBox", ["tallBox"], "tallBox"),
        ("light", ["light"], "light"),
    ]
    out = []
    for shape_name, member_groups, mat_name in shape_plan:
        tris = []
        for name, quad in _CORNELL_QUADS:
            if name in member_groups:
                qa = np.asarray(quad, np.float32)
                tris.append(qa[[0, 1, 2]])
                tris.append(qa[[0, 2, 3]])
        out.append(MeshData(name=shape_name, vertices=np.stack(tris), normals=None,
                            uv=None, material=_CORNELL_MATERIALS[mat_name]))
    return out


def cornell_box(pad_multiple: int = DEFAULT_PAD_MULTIPLE,
                faithful_shapes: bool = True) -> Scene:
    """The canonical benchmark scene (reference scripts/run.sh:28-30)."""
    return scene_from_mesh(cornell_meshes(faithful_shapes), pad_multiple=pad_multiple)


def write_cornell_obj(obj_path: str, mtl_path: Optional[str] = None) -> None:
    """Emit the Cornell scene as OBJ+MTL files (fixture generator for tests
    and for exercising the OBJ loader / CLI without reference data)."""
    import os

    if mtl_path is None:
        mtl_path = os.path.splitext(obj_path)[0] + ".mtl"
    with open(mtl_path, "w") as fh:
        for name, m in _CORNELL_MATERIALS.items():
            fh.write(f"newmtl {name}\n")
            fh.write(f"  Ns {m.ns}\n")
            fh.write(f"  Ka {m.ka[0]} {m.ka[1]} {m.ka[2]}\n")
            fh.write(f"  Kd {m.kd[0]} {m.kd[1]} {m.kd[2]}\n")
            fh.write(f"  Ks {m.ks[0]} {m.ks[1]} {m.ks[2]}\n")
            fh.write(f"  Ke {m.ke[0]} {m.ke[1]} {m.ke[2]}\n\n")
    with open(obj_path, "w") as fh:
        fh.write(f"mtllib {os.path.basename(mtl_path)}\n")
        # Group each quad under its own g-name so loader grouping is clean
        # (fixture uses the non-quirky layout; cornell_meshes(faithful_shapes)
        # covers reference-exact grouping separately).
        for i, (name, quad) in enumerate(_CORNELL_QUADS):
            fh.write(f"g {name}_{i}\nusemtl {name}\n")
            for vx, vy, vz in quad:
                fh.write(f"v {vx} {vy} {vz}\n")
            fh.write("f -4 -3 -2 -1\n")


# --- Cornell variants (procedural equivalents of the reference's 10
# --- model files, src/models/cornell/) ------------------------------------

_MIRROR_MATERIAL = Material.make(  # CornellBox-Mirror.mtl tallBox
    ka=(0.01, 0.01, 0.01), kd=(0.01, 0.01, 0.01), ks=(0.95, 0.95, 0.95),
    ns=1000.0)
_GLOSSY_MATERIAL = Material.make(  # CornellBox-Glossy.mtl shortBox
    ka=(0.525, 0.51, 0.48), kd=(0.525, 0.51, 0.48), ks=(0.8, 0.8, 0.8),
    ns=40.0)
_WATER_MATERIAL = Material.make(  # CornellBox-Water.mtl water
    ka=(0.01, 0.01, 0.01), kd=(0.30, 0.30, 0.70), ks=(0.01, 0.01, 0.01),
    ns=200.0)
_LEFT_SPHERE_MATERIAL = Material.make(  # CornellBox-Sphere.mtl leftSphere
    ka=(0.01, 0.01, 0.01), kd=(0.01, 0.01, 0.01), ks=(0.95, 0.95, 0.95),
    ns=1024.0)
_RIGHT_SPHERE_MATERIAL = Material.make(  # CornellBox-Sphere.mtl rightSphere
    ka=(0.01, 0.01, 0.01), kd=(0.30, 0.30, 0.30), ks=(0.01, 0.01, 0.01),
    ns=1024.0)

# Wall/light swaps for the empty-box fixtures (walls + light panel, no
# boxes) — reference src/models/cornell/CornellBox-Empty-{CO,RG,White,
# Squashed}.mtl. Values are the public-domain Cardenas/McGuire data.
_WHITE_LIGHT = Material.make(ka=(0.78, 0.78, 0.78), kd=(0.78, 0.78, 0.78),
                             ke=(10.0, 10.0, 10.0), ns=10.0)


def _wall(rgb, ns=10.0):
    return Material.make(ka=rgb, kd=rgb, ns=ns)


_EMPTY_OVERRIDES = {
    "empty_co": {  # orange left wall, cyan right wall
        "leftWall": _wall((0.953, 0.357, 0.212)),
        "rightWall": _wall((0.486, 0.631, 0.663)),
        "light": _WHITE_LIGHT,
    },
    "empty_rg": {},  # original red/green walls, original light
    "empty_white": {
        **{g: _wall((1.0, 1.0, 1.0))
           for g in ("floor", "ceiling", "backWall", "leftWall", "rightWall")},
        "light": _WHITE_LIGHT,
    },
    "empty_squashed": {  # red left wall, blue right wall
        "rightWall": _wall((0.161, 0.133, 0.427)),
        "light": _WHITE_LIGHT,
    },
}


def _cornell_shell(material_overrides=None, drop_groups=()) -> List[MeshData]:
    """Cornell meshes (clean grouping) with per-group material swaps."""
    overrides = material_overrides or {}
    groups = {}
    order = []
    for name, quad in _CORNELL_QUADS:
        if name in drop_groups:
            continue
        groups.setdefault(name, []).append(quad)
        if name not in order:
            order.append(name)
    out = []
    for name in order:
        tris = []
        for q in groups[name]:
            qa = np.asarray(q, np.float32)
            tris.append(qa[[0, 1, 2]])
            tris.append(qa[[0, 2, 3]])
        out.append(MeshData(name=name, vertices=np.stack(tris), normals=None,
                            uv=None,
                            material=overrides.get(name, _CORNELL_MATERIALS[name])))
    return out


def water_surface_mesh(n: int = 64, amplitude: float = 0.05, y: float = 0.35,
                       extent: float = 0.99,
                       material: Optional[Material] = None) -> MeshData:
    """A sine-wave water heightfield with analytic smooth normals — the
    dense-mesh role of the reference's water surface (CornellBox-Water.obj
    'g water', 2x64x64-class tessellation)."""
    mat = material or _WATER_MATERIAL
    xs = np.linspace(-extent, extent, n + 1, dtype=np.float32)
    zs = np.linspace(-extent, extent, n + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    kx, kz = np.float32(2.5 * np.pi), np.float32(2.0 * np.pi)
    Y = y + amplitude * np.sin(kx * X) * np.cos(kz * Z)
    # analytic gradient -> smooth normals
    dYdx = amplitude * kx * np.cos(kx * X) * np.cos(kz * Z)
    dYdz = -amplitude * kz * np.sin(kx * X) * np.sin(kz * Z)
    P = np.stack([X, Y, Z], axis=-1).astype(np.float32)  # [n+1, n+1, 3]
    N = np.stack([-dYdx, np.ones_like(Y), -dYdz], axis=-1)
    N = (N / np.linalg.norm(N, axis=-1, keepdims=True)).astype(np.float32)

    def corners(A):
        a = A[:-1, :-1]
        b = A[1:, :-1]
        c = A[1:, 1:]
        d = A[:-1, 1:]
        t1 = np.stack([a, b, c], axis=2)
        t2 = np.stack([a, c, d], axis=2)
        return np.concatenate([t1, t2], axis=2).reshape(-1, 3, A.shape[-1])

    verts = corners(P)
    norms = corners(N)
    return MeshData(name="water", vertices=verts, normals=norms, uv=None,
                    material=mat)


def cornell_variant(name: str = "original") -> Scene:
    """Procedural equivalents of the reference's Cornell model variants.

    original | mirror (tallBox -> 0.95 specular, Ns 1000) |
    glossy (shortBox -> 0.8 specular, Ns 40) |
    sphere (boxes -> two analytic spheres, mirror-left/diffuse-right) |
    water (boxes -> dense sine heightfield with the water material) |
    empty_co / empty_rg / empty_white (walls + light, no boxes; orange-cyan,
    red-green, all-white walls) | empty_squashed (non-uniform y squash +
    shallow water sheet) | empty_nolight (no emissive geometry; L=0 path).
    Materials match the reference .mtl files (src/models/cornell/*.mtl);
    sphere placement matches the leftSphere bounds of CornellBox-Sphere.obj.
    """
    if name == "original":
        return cornell_box()
    if name == "mirror":
        return scene_from_mesh(_cornell_shell({"tallBox": _MIRROR_MATERIAL}))
    if name == "glossy":
        return scene_from_mesh(_cornell_shell({"shortBox": _GLOSSY_MATERIAL}))
    if name == "sphere":
        spheres = make_spheres(
            centers=[(0.446, 0.332, 0.377), (-0.42, 0.33, -0.3)],
            radii=[0.325, 0.325],
            materials=[_LEFT_SPHERE_MATERIAL, _RIGHT_SPHERE_MATERIAL],
        )
        meshes = _cornell_shell(drop_groups=("shortBox", "tallBox"))
        return scene_from_mesh(meshes, spheres=spheres)
    if name == "water":
        meshes = _cornell_shell(drop_groups=("shortBox", "tallBox"))
        meshes.append(water_surface_mesh())
        return scene_from_mesh(meshes)
    if name in _EMPTY_OVERRIDES:
        # Empty boxes: shell + light panel only, per-variant wall swaps
        # (CornellBox-Empty-*.obj keep the light but drop both boxes).
        meshes = _cornell_shell(_EMPTY_OVERRIDES[name],
                                drop_groups=("shortBox", "tallBox"))
        if name == "empty_squashed":
            # Non-uniform vertical squash (reference ceiling at y=1.59 vs
            # 1.99) plus the shallow water sheet the squashed file carries.
            ys = np.asarray([1.0, 1.59 / 1.99, 1.0], np.float32)
            meshes = [
                MeshData(name=m.name, vertices=m.vertices * ys, normals=None,
                         uv=None, material=m.material)
                for m in meshes
            ]
            meshes.append(water_surface_mesh(n=16, amplitude=0.02, y=0.22))
        return scene_from_mesh(meshes)
    if name == "empty_nolight":
        # No emissive geometry at all — exercises the L=0 shading path
        # (ambient-only image; no reference model, degenerate-case fixture).
        return scene_from_mesh(
            _cornell_shell(drop_groups=("shortBox", "tallBox", "light")))
    raise ValueError(
        f"unknown cornell variant {name!r}; "
        "expected original|mirror|glossy|sphere|water|empty_co|empty_rg|"
        "empty_white|empty_squashed|empty_nolight"
    )


def write_obj(obj_path: str, meshes: Sequence[MeshData],
              mtl_path: Optional[str] = None) -> None:
    """Serialize meshes as OBJ+MTL (de-indexed corners, optional normals).

    The general-purpose exporter counterpart of the loaders — used to
    exercise the OBJ pipeline on mesh-scale assets (the role of the
    reference's shipped water.obj / CornellBox-Sphere.obj files)."""
    import os

    if mtl_path is None:
        mtl_path = os.path.splitext(obj_path)[0] + ".mtl"
    with open(mtl_path, "w") as fh:
        for i, mesh in enumerate(meshes):
            m = mesh.material
            fh.write(f"newmtl m{i}_{mesh.name}\n")
            fh.write(f"  Ns {m.ns}\n")
            fh.write(f"  Ka {m.ka[0]} {m.ka[1]} {m.ka[2]}\n")
            fh.write(f"  Kd {m.kd[0]} {m.kd[1]} {m.kd[2]}\n")
            fh.write(f"  Ks {m.ks[0]} {m.ks[1]} {m.ks[2]}\n")
            fh.write(f"  Ke {m.ke[0]} {m.ke[1]} {m.ke[2]}\n\n")
    with open(obj_path, "w") as fh:
        fh.write(f"mtllib {os.path.basename(mtl_path)}\n")
        v_base = 1  # OBJ indices are 1-based and global across groups
        n_base = 1
        for i, mesh in enumerate(meshes):
            fh.write(f"g {mesh.name}_{i}\nusemtl m{i}_{mesh.name}\n")
            for x, y, z in mesh.vertices.reshape(-1, 3):
                fh.write(f"v {x} {y} {z}\n")
            if mesh.normals is not None:
                for x, y, z in mesh.normals.reshape(-1, 3):
                    fh.write(f"vn {x} {y} {z}\n")
                for f in range(mesh.num_faces):
                    a, b = v_base + 3 * f, n_base + 3 * f
                    fh.write(f"f {a}//{b} {a+1}//{b+1} {a+2}//{b+2}\n")
                n_base += 3 * mesh.num_faces
            else:
                for f in range(mesh.num_faces):
                    a = v_base + 3 * f
                    fh.write(f"f {a} {a+1} {a+2}\n")
            v_base += 3 * mesh.num_faces


# --- BASELINE.json procedural configs -------------------------------------

def _ground_plane(y: float = 0.0, half: float = 50.0,
                  material: Optional[Material] = None) -> MeshData:
    mat = material or Material.make(ka=(0.5, 0.5, 0.5), kd=(0.5, 0.5, 0.5), ns=10.0)
    quad = ((-half, y, half), (half, y, half), (half, y, -half), (-half, y, -half))
    return _quad_mesh("ground", quad, mat)


def _area_light(center=(0.0, 5.0, 0.0), half: float = 1.0,
                ke=(17.0, 12.0, 4.0)) -> MeshData:
    cx, cy, cz = center
    quad = (
        (cx - half, cy, cz + half), (cx - half, cy, cz - half),
        (cx + half, cy, cz - half), (cx + half, cy, cz + half),
    )
    mat = Material.make(ka=(0.78, 0.78, 0.78), kd=(0.78, 0.78, 0.78), ke=ke, ns=10.0)
    return _quad_mesh("light", quad, mat)


def sphere_plane_scene() -> Scene:
    """BASELINE config 1: single sphere + ground plane (render 256², depth 1)."""
    spheres = make_spheres(
        centers=[(0.0, 1.0, 0.0)],
        radii=[1.0],
        materials=[Material.make(ka=(0.7, 0.2, 0.2), kd=(0.7, 0.2, 0.2),
                                 ks=(0.2, 0.2, 0.2), ns=32.0)],
    )
    meshes = [_ground_plane(), _area_light(center=(0.0, 6.0, 2.0), half=1.5)]
    return scene_from_mesh(meshes, spheres=spheres)


def ten_sphere_scene(seed: int = 0) -> Scene:
    """BASELINE config 2: 10-sphere Phong scene with shadows (512², depth 2)."""
    rng = np.random.RandomState(seed)
    centers, radii, mats = [], [], []
    for i in range(10):
        angle = 2.0 * np.pi * i / 10.0
        r = 0.35 + 0.25 * rng.rand()
        centers.append((3.0 * np.cos(angle), r, 3.0 * np.sin(angle)))
        radii.append(r)
        color = rng.rand(3).astype(np.float32) * 0.7 + 0.2
        mats.append(Material.make(ka=color, kd=color, ks=(0.3, 0.3, 0.3), ns=64.0))
    spheres = make_spheres(centers, radii, mats)
    meshes = [_ground_plane(), _area_light(center=(0.0, 7.0, 0.0), half=2.0)]
    return scene_from_mesh(meshes, spheres=spheres)


def icosphere_mesh(subdivisions: int = 4, radius: float = 1.0,
                   center=(0.0, 1.0, 0.0),
                   material: Optional[Material] = None,
                   smooth: bool = True) -> MeshData:
    """Procedural icosphere (~20 * 4^s triangles; s=4 → 5120, s=5 → 20480).

    Stands in for the reference's OBJ mesh models in BASELINE config 3
    (~10k-triangle mesh, brute-force intersect) with optional smooth
    per-corner normals exercising the barycentric-normal path
    (reference src/main.cpp:733-738).
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [(-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
         (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
         (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1)],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
         (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
         (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
         (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)],
        np.int64,
    )
    for _ in range(subdivisions):
        vlist = list(verts)
        cache = {}

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)

    unit = verts[faces]  # [F, 3, 3] on the unit sphere
    tri = (unit * radius + np.asarray(center)).astype(np.float32)
    normals = unit.astype(np.float32) if smooth else None
    mat = material or Material.make(ka=(0.4, 0.4, 0.7), kd=(0.4, 0.4, 0.7),
                                    ks=(0.3, 0.3, 0.3), ns=32.0)
    return MeshData(name="icosphere", vertices=tri, normals=normals, uv=None, material=mat)


def mesh_scene(subdivisions: int = 4) -> Scene:
    """BASELINE config 3: ~10k-triangle mesh, brute-force intersect."""
    meshes = [
        icosphere_mesh(subdivisions=subdivisions),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ]
    return scene_from_mesh(meshes)


def mixed_scene() -> Scene:
    """BASELINE config 4: spheres + mesh, depth-4 reflections, differentiable."""
    spheres = make_spheres(
        centers=[(2.2, 0.8, 0.0), (-2.2, 0.6, 0.5), (0.0, 0.5, 2.4)],
        radii=[0.8, 0.6, 0.5],
        materials=[
            Material.make(ka=(0.2, 0.2, 0.25), kd=(0.3, 0.3, 0.35),
                          ks=(0.7, 0.7, 0.7), ns=128.0),
            Material.make(ka=(0.6, 0.2, 0.2), kd=(0.6, 0.2, 0.2),
                          ks=(0.3, 0.3, 0.3), ns=32.0),
            Material.make(ka=(0.2, 0.5, 0.2), kd=(0.2, 0.5, 0.2),
                          ks=(0.4, 0.4, 0.4), ns=64.0),
        ],
    )
    meshes = [
        icosphere_mesh(subdivisions=3, radius=0.9, center=(0.0, 0.9, -1.5),
                       material=Material.make(ka=(0.4, 0.4, 0.7), kd=(0.4, 0.4, 0.7),
                                              ks=(0.5, 0.5, 0.5), ns=64.0)),
        _ground_plane(),
        _area_light(center=(0.0, 7.0, 1.0), half=2.0),
    ]
    return scene_from_mesh(meshes, spheres=spheres)


def random_scene(num_triangles: int = 100_000, seed: int = 0,
                 extent: float = 20.0) -> Scene:
    """BASELINE config 5 generator: a soup of `num_triangles` small triangles
    (plus one area light), for 100k-primitive / multi-host scaling runs."""
    rng = np.random.RandomState(seed)
    centers = (rng.rand(num_triangles, 1, 3) - 0.5) * 2.0 * extent
    centers[..., 1] = np.abs(centers[..., 1]) * 0.5  # keep above ground
    offsets = (rng.rand(num_triangles, 3, 3) - 0.5) * 0.5
    tris = (centers + offsets).astype(np.float32)
    color = (0.3, 0.5, 0.7)
    mat = Material.make(ka=color, kd=color, ks=(0.2, 0.2, 0.2), ns=16.0)
    soup = MeshData(name="soup", vertices=tris, normals=None, uv=None, material=mat)
    meshes = [soup, _ground_plane(half=3 * extent),
              _area_light(center=(0.0, 1.5 * extent, 0.0), half=extent / 4)]
    return scene_from_mesh(meshes)
