"""Binary/ASCII PLY mesh + point-cloud I/O (replaces trimesh/open3d I/O).

Writes binary_little_endian by default; reads both binary_little_endian
and ascii files with float/double vertices, optional uchar colors and
int vertex_indices face lists — the subset produced/consumed by the
reference toolchain (extracted meshes, error-colored point clouds, GT
scans)."""

from __future__ import annotations

import numpy as np


def write_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    normals: np.ndarray | None = None,
    comment: str = "neuralrecon_w_tpu",
) -> None:
    verts = np.asarray(verts, dtype="<f4")
    n_vert = len(verts)
    header = ["ply", "format binary_little_endian 1.0", f"comment {comment}"]
    header.append(f"element vertex {n_vert}")
    header += ["property float x", "property float y", "property float z"]
    if normals is not None:
        header += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        header += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    fields = [("xyz", "<f4", 3)]
    if normals is not None:
        fields.append(("n", "<f4", 3))
    if colors is not None:
        fields.append(("rgb", "u1", 3))
    dtype = np.dtype([(name, t, cnt) for name, t, cnt in fields])
    rec = np.empty(n_vert, dtype=dtype)
    rec["xyz"] = verts
    if normals is not None:
        rec["n"] = np.asarray(normals, dtype="<f4")
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = np.clip(c, 0, 255).astype(np.uint8)
        rec["rgb"] = c

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())
        if faces is not None and len(faces):
            fdt = np.dtype([("cnt", "u1"), ("idx", "<i4", 3)])
            frec = np.empty(len(faces), dtype=fdt)
            frec["cnt"] = 3
            frec["idx"] = np.asarray(faces, dtype="<i4")
            f.write(frec.tobytes())


_PLY_TYPES = {
    "float": ("<f4", 4), "float32": ("<f4", 4),
    "double": ("<f8", 8), "float64": ("<f8", 8),
    "uchar": ("u1", 1), "uint8": ("u1", 1),
    "char": ("i1", 1), "int8": ("i1", 1),
    "short": ("<i2", 2), "ushort": ("<u2", 2),
    "int": ("<i4", 4), "int32": ("<i4", 4),
    "uint": ("<u4", 4), "uint32": ("<u4", 4),
}


def read_ply(path: str):
    """Read a PLY file.

    Returns dict with 'verts' (V, 3) float64, optional 'colors' (V, 3)
    uint8, optional 'normals' (V, 3), optional 'faces' (F, 3) int64."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", f"not a ply file: {path}"
        fmt = None
        elements = []  # (name, count, [(prop_name, type) or ('list', ...)])
        while True:
            line = f.readline().decode("ascii").strip()
            if line == "end_header":
                break
            tok = line.split()
            if not tok or tok[0] == "comment":
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                elements.append((tok[1], int(tok[2]), []))
            elif tok[0] == "property":
                if tok[1] == "list":
                    elements[-1][2].append(("list", tok[2], tok[3], tok[4]))
                else:
                    elements[-1][2].append(("scalar", tok[1], tok[2]))

        out = {}
        if fmt == "ascii":
            _read_ascii_body(f, elements, out)
        else:
            assert fmt == "binary_little_endian", f"unsupported format {fmt}"
            _read_binary_body(f, elements, out)
    return out


def _read_binary_body(f, elements, out):
    for name, count, props in elements:
        if all(p[0] == "scalar" for p in props):
            dtype = np.dtype([(p[2], _PLY_TYPES[p[1]][0]) for p in props])
            rec = np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
            _collect_vertex_fields(name, rec, {p[2] for p in props}, out)
        else:
            # list property (faces): parse sequentially but buffered
            assert len(props) == 1 and props[0][0] == "list"
            cnt_t, idx_t = _PLY_TYPES[props[0][1]], _PLY_TYPES[props[0][2]]
            data = f.read()
            faces = []
            off = 0
            for _ in range(count):
                n = int(np.frombuffer(data, cnt_t[0], 1, off)[0])
                off += cnt_t[1]
                idx = np.frombuffer(data, idx_t[0], n, off)
                off += idx_t[1] * n
                if n == 3:
                    faces.append(idx)
                else:  # fan-triangulate
                    for k in range(1, n - 1):
                        faces.append(np.array([idx[0], idx[k], idx[k + 1]]))
            out["faces"] = np.array(faces, dtype=np.int64).reshape(-1, 3)
            f.seek(-(len(data) - off), 2) if off < len(data) else None


def _read_ascii_body(f, elements, out):
    for name, count, props in elements:
        if all(p[0] == "scalar" for p in props):
            names = [p[2] for p in props]
            rows = [f.readline().split() for _ in range(count)]
            arr = np.array(rows, dtype=np.float64)
            rec = {nm: arr[:, i] for i, nm in enumerate(names)}
            _collect_vertex_fields(name, rec, set(names), out)
        else:
            faces = []
            for _ in range(count):
                tok = f.readline().split()
                n = int(tok[0])
                idx = [int(v) for v in tok[1 : 1 + n]]
                for k in range(1, n - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
            out["faces"] = np.array(faces, dtype=np.int64).reshape(-1, 3)


def _collect_vertex_fields(name, rec, fields, out):
    if name != "vertex":
        return
    get = (lambda k: np.asarray(rec[k], np.float64))
    out["verts"] = np.stack([get("x"), get("y"), get("z")], axis=-1)
    if {"red", "green", "blue"} <= fields:
        out["colors"] = np.stack(
            [np.asarray(rec["red"]), np.asarray(rec["green"]), np.asarray(rec["blue"])],
            axis=-1,
        ).astype(np.uint8)
    if {"nx", "ny", "nz"} <= fields:
        out["normals"] = np.stack([get("nx"), get("ny"), get("nz")], axis=-1)
