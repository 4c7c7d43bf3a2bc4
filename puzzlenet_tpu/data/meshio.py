"""Mesh I/O and surface sampling (pure numpy, no open3d/plyfile).

Capability parity with /root/reference/se_math/mesh.py: a Mesh container,
``offread`` (including the ModelNet broken-header tolerance, mesh.py:121-171
— some ModelNet OFF files glue the counts onto the 'OFF' line), ``objread``
(mesh.py:173-223), ``plyread`` (mesh.py:226-240), and
``offread_uniformed``-style uniform surface sampling (mesh.py:110-119),
reimplemented here as area-weighted triangle sampling in numpy instead of
open3d's sampler.
"""

import numpy as np


class Mesh:
    """Vertex/face container (se_math/mesh.py Mesh equivalent)."""

    def __init__(self, vertices, faces):
        self.vertex_array = np.asarray(vertices, np.float64)
        self.faces = [list(f) for f in faces]

    def clone(self):
        return Mesh(self.vertex_array.copy(), [list(f) for f in self.faces])

    @property
    def triangle_array(self):
        """Fan-triangulated faces as an [T, 3] int array."""
        tris = []
        for f in self.faces:
            for i in range(1, len(f) - 1):
                tris.append((f[0], f[i], f[i + 1]))
        return np.asarray(tris, np.int64)

    def sample_uniform(self, n, rng=None):
        """Area-weighted uniform surface sampling -> [n, 3] float32
        (offread_uniformed / o3d sample_points_uniformly equivalent)."""
        rng = rng or np.random.default_rng()
        tris = self.triangle_array
        v = self.vertex_array
        a, b, c = v[tris[:, 0]], v[tris[:, 1]], v[tris[:, 2]]
        areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        total = areas.sum()
        if total <= 0:  # degenerate mesh: fall back to vertex resampling
            idx = rng.integers(0, len(v), n)
            return v[idx].astype(np.float32)
        probs = areas / total
        t_idx = rng.choice(len(tris), size=n, p=probs)
        u = rng.random(n)
        w = rng.random(n)
        flip = u + w > 1
        u[flip], w[flip] = 1 - u[flip], 1 - w[flip]
        pts = (a[t_idx] + u[:, None] * (b[t_idx] - a[t_idx])
               + w[:, None] * (c[t_idx] - a[t_idx]))
        return pts.astype(np.float32)


def _read_tokens(path):
    with open(path, "r", errors="ignore") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                yield line


def offread(path):
    """OFF reader tolerant of the broken ModelNet header ('OFF123 456 0' on
    one line, mesh.py:136-147)."""
    lines = list(_read_tokens(path))
    first = lines[0]
    if first.startswith("OFF") and len(first) > 3:
        counts = first[3:].split()
        body = lines[1:]
    else:
        if first != "OFF":
            raise ValueError(f"not an OFF file: {path}")
        counts = lines[1].split()
        body = lines[2:]
    nv, nf = int(counts[0]), int(counts[1])
    verts = [tuple(map(float, body[i].split()[:3])) for i in range(nv)]
    faces = []
    for i in range(nv, nv + nf):
        parts = body[i].split()
        k = int(parts[0])
        faces.append([int(p) for p in parts[1:1 + k]])
    return Mesh(verts, faces)


def objread(path):
    """Wavefront OBJ reader: v and f records (1-based, may carry /vt/vn)."""
    verts, faces = [], []
    for line in _read_tokens(path):
        parts = line.split()
        if parts[0] == "v":
            verts.append(tuple(map(float, parts[1:4])))
        elif parts[0] == "f":
            faces.append([int(p.split("/")[0]) - 1 for p in parts[1:]])
    return Mesh(verts, faces)


def plyread(path):
    """ASCII PLY reader (vertex x/y/z + face vertex lists)."""
    with open(path, "r", errors="ignore") as f:
        if f.readline().strip() != "ply":
            raise ValueError(f"not a PLY file: {path}")
        nv = nf = 0
        fmt = "ascii"
        props = []
        current = None
        while True:
            raw = f.readline()
            if raw == "":        # EOF before end_header: truncated file
                raise ValueError(f"truncated PLY header: {path}")
            line = raw.strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                nv = int(line.split()[-1])
                current = "vertex"
            elif line.startswith("element face"):
                nf = int(line.split()[-1])
                current = "face"
            elif line.startswith("property") and current == "vertex":
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        if fmt != "ascii":
            raise ValueError("only ascii PLY supported")
        ix, iy, iz = props.index("x"), props.index("y"), props.index("z")
        verts = []
        for _ in range(nv):
            vals = f.readline().split()
            verts.append((float(vals[ix]), float(vals[iy]), float(vals[iz])))
        faces = []
        for _ in range(nf):
            vals = f.readline().split()
            k = int(vals[0])
            faces.append([int(v) for v in vals[1:1 + k]])
    return Mesh(verts, faces)


def read_mesh(path):
    """Extension-dispatched reader (off/obj/ply)."""
    ext = path.rsplit(".", 1)[-1].lower()
    return {"off": offread, "obj": objread, "ply": plyread}[ext](path)


def offread_uniformed(path, n_points=10000, rng=None):
    """Read an OFF mesh and uniformly sample its surface
    (se_math/mesh.py:110-119 equivalent)."""
    return offread(path).sample_uniform(n_points, rng=rng)
