"""Offline renderer: the headless replacement for mclscene's GL pipeline
(Application/RenderGL, deps/mclscene/src/Application.cpp, RenderGL.cpp).

Renders scene objects to PNG frames with flat diffuse shading + painter's
sort — enough to visually inspect every bundled scene without a GPU/window —
and provides `render_rollout` to dump an animation's frames (the analog of
the reference's S-key frame dump, Application.cpp:246-261).
"""

from __future__ import annotations

import os

import numpy as np


def _project(points, eye, center, up, fov_deg, aspect):
    f = center - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    rel = points - eye
    cam = np.stack([rel @ r, rel @ u, rel @ f], axis=1)
    z = np.maximum(cam[:, 2], 1e-6)
    scale = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    x = cam[:, 0] / z * scale / aspect
    y = cam[:, 1] / z * scale
    return np.stack([x, y], axis=1), z


def render_frame(
    objects,
    path: str,
    eye=None,
    center=None,
    up=(0.0, 1.0, 0.0),
    fov_deg=40.0,
    size=(800, 600),
    light_dir=(0.3, 0.8, 0.5),
    colors=None,
    lights=None,
    materials=None,
):
    """Render [(vertices, faces), ...] (or SceneObjects) to a PNG.

    lights: optional list of point lights [{'position': (3,), 'intensity':
    (3,), 'falloff': (3,)}] — when given, faces are shaded Blinn-Phong
    (RenderGL.cpp / blinnphong.frag semantics: ambient + per-light
    attenuated diffuse + specular) instead of the single-directional
    default. materials: optional per-object dicts {'ambient','diffuse',
    'specular','shininess'} (Material.hpp BlinnPhong)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import PolyCollection

    meshes = []
    for o in objects:
        if hasattr(o, "vertices") and hasattr(o, "faces"):
            meshes.append((np.asarray(o.vertices, float), np.asarray(o.faces)))
        else:
            v, f = o
            meshes.append((np.asarray(v, float), np.asarray(f)))

    all_v = np.concatenate([v for v, _ in meshes if len(v)], axis=0)
    c = 0.5 * (all_v.min(axis=0) + all_v.max(axis=0))
    rad = max(np.linalg.norm(all_v - c, axis=1).max(), 1e-6)
    if center is None:
        center = c
    if eye is None:
        eye = c + np.array([0.6, 0.25, 1.0]) * rad * 2.4
    eye = np.asarray(eye, float)
    center = np.asarray(center, float)
    up = np.asarray(up, float)
    ldir = np.asarray(light_dir, float)
    ldir = ldir / np.linalg.norm(ldir)

    default_colors = [(0.65, 0.71, 0.85), (0.5, 0.5, 0.5), (0.75, 0.6, 0.55),
                      (0.6, 0.78, 0.62)]
    aspect = size[0] / size[1]
    fig = plt.figure(figsize=(size[0] / 100, size[1] / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.axis("off")

    polys, depths, face_cols = [], [], []
    for mi, (v, f) in enumerate(meshes):
        if len(f) == 0:
            continue
        mat = materials[mi] if materials else None
        base = np.asarray(
            (mat or {}).get("diffuse")
            if mat and mat.get("diffuse") is not None
            else (colors[mi] if colors
                  else default_colors[mi % len(default_colors)]),
            float,
        )
        p2, z = _project(v, eye, center, up, fov_deg, aspect)
        tri2 = p2[f]
        triz = z[f].mean(axis=1)
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        nl = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.where(nl > 0, nl, 1.0)
        if lights:
            # Blinn-Phong per face (flat): amb + sum_l atten*(kd |n.l| I_l
            # + ks |n.h|^shin I_l) — two-sided like the flat default
            amb = np.asarray((mat or {}).get("ambient", base * 0.25), float)
            ks = np.asarray((mat or {}).get("specular", (0, 0, 0)), float)
            shin = float((mat or {}).get("shininess", 32.0))
            cents = v[f].mean(axis=1)
            view = eye[None, :] - cents
            view = view / np.linalg.norm(view, axis=1, keepdims=True)
            col = np.broadcast_to(amb, (len(f), 3)).copy()
            for lt in lights:
                lp = np.asarray(lt["position"], float)
                inten = np.asarray(lt.get("intensity", (1, 1, 1)), float)
                fo = np.asarray(lt.get("falloff", (1, 0, 0)), float)
                L = lp[None, :] - cents
                d = np.linalg.norm(L, axis=1, keepdims=True)
                Ln = L / np.where(d > 0, d, 1.0)
                atten = 1.0 / (fo[0] + fo[1] * d + fo[2] * d * d)
                ndl = np.abs(np.sum(n * Ln, axis=1, keepdims=True))
                h = Ln + view
                h = h / np.maximum(
                    np.linalg.norm(h, axis=1, keepdims=True), 1e-12
                )
                ndh = np.abs(np.sum(n * h, axis=1, keepdims=True))
                col = col + atten * (
                    base[None, :] * ndl * inten[None, :]
                    + ks[None, :] * (ndh ** shin) * inten[None, :]
                )
            col = np.clip(col, 0, 1)
            for i in range(len(f)):
                polys.append(tri2[i])
                depths.append(triz[i])
                face_cols.append(tuple(col[i]))
        else:
            shade = 0.25 + 0.75 * np.abs(n @ ldir)
            for i in range(len(f)):
                polys.append(tri2[i])
                depths.append(triz[i])
                face_cols.append(
                    tuple(np.clip(np.asarray(base) * shade[i], 0, 1))
                )

    order = np.argsort(-np.asarray(depths))  # far first
    pc = PolyCollection(
        [polys[i] for i in order],
        facecolors=[face_cols[i] for i in order],
        edgecolors="none",
    )
    ax.add_collection(pc)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path


def _vec3_param(comp, tag, default=None):
    try:
        p = comp.get(tag)
    except Exception:
        p = None
    if p is None:
        return default
    return np.asarray(p.as_vec3(), float)


def object_material(cfg, obj):
    """The XML-declared BlinnPhong material of a SceneObject (or {}):
    the single lookup shared by the offline renderer and the HTML
    viewer."""
    try:
        mname = obj.component.get("material").value
    except Exception:
        mname = None
    if cfg is None or not mname or mname not in cfg.materials:
        return {}
    mc = cfg.materials[mname]
    mat = {
        "ambient": _vec3_param(mc, "ambient"),
        "diffuse": _vec3_param(mc, "diffuse", np.asarray((0.6, 0.6, 0.6))),
        "specular": _vec3_param(mc, "specular", np.asarray((0.0,) * 3)),
    }
    try:
        mat["shininess"] = mc.get("shininess").as_double()
    except Exception:
        pass
    if mat["ambient"] is None:
        mat["ambient"] = mat["diffuse"] * 0.25
    return mat


def render_scene(ctx, path: str, **kwargs):
    """Render a SimContext using its PARSED scene assets: per-object
    BlinnPhong materials (scene.materials, Material.hpp), point lights
    (scene.lights, Light.hpp:48-74), and the first camera's eye/lookat if
    present — the offline analog of RenderGL::draw_objects consuming the
    same XML-declared assets."""
    cfg = ctx.scene
    vec = _vec3_param

    materials = [object_material(cfg, o) for o in ctx.objects]

    lights = []
    if cfg is not None:
        for lc in cfg.lights:
            pos = vec(lc, "position")
            if pos is None:
                continue
            lights.append({
                "position": pos,
                "intensity": vec(lc, "intensity", np.asarray((0.7,) * 3)),
                "falloff": vec(lc, "falloff", np.asarray((1.0, 0.0, 0.0))),
            })

    if cfg is not None and cfg.cameras:
        cc = cfg.cameras[0]
        eye = vec(cc, "eye")
        lookat = vec(cc, "lookat")
        if eye is not None:
            kwargs.setdefault("eye", eye)
        if lookat is not None:
            kwargs.setdefault("center", lookat)

    kwargs.setdefault("lights", lights or None)
    kwargs.setdefault("materials", materials)
    return render_frame(ctx.objects, path, **kwargs)


def render_rollout(ctx, directory: str, n_frames: int, steps_per_frame: int = 1,
                   **kwargs):
    """Step a SimContext and render a frame every steps_per_frame steps."""
    paths = []
    for i in range(n_frames):
        for _ in range(steps_per_frame):
            ctx.step()
        ctx.update()
        paths.append(
            render_frame(ctx.objects, os.path.join(directory, f"frame_{i:05d}.png"),
                         **kwargs)
        )
    return paths
