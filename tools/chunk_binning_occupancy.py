"""CPU feasibility analysis for FACE-CHUNK binning (ROADMAP sketch).

Idea: reorder the render submesh once (host, spatial sort of template
centroids), bin 32-face CHUNKS by union-bbox, and let the z-buffer kernel
index the full record table by chunk id (436KB -> fits VMEM). This deletes
the per-face record gather + compact plan and shrinks the binning sort to
F/32 candidates — IF chunk bboxes stay tight enough that per-tile chunk
counts stay near the compact path's occupied-chunk count (~150/image at
224px).

Prints, for {original, morton, hilbert-ish} face orders: total chunk-tile
incidences per image (= kernel chunk iterations) vs the face-level
baseline, and the max per-tile chunk count (capacity sizing).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def morton_key(xyz, bits=10):
    """Interleave 3x bits-bit quantized coords -> z-order curve key."""
    q = np.clip(((xyz - xyz.min(0)) / (np.ptp(xyz, 0) + 1e-9)) * (2**bits - 1),
                0, 2**bits - 1).astype(np.uint64)
    key = np.zeros(len(xyz), np.uint64)
    for b in range(bits):
        for d in range(3):
            key |= ((q[:, d] >> b) & 1) << np.uint64(3 * b + d)
    return key


def analyze(order_name, order, px, py, F, H=224, W=224, CH=32,
            TR=8, TC=128):
    xo = px[order]  # (F,3)
    yo = py[order]
    ty, tx = -(-H // TR), -(-W // TC)
    nch = -(-F // CH)
    pad = nch * CH - F
    if pad:
        xo = np.concatenate([xo, np.repeat(xo[-1:], pad, 0)])
        yo = np.concatenate([yo, np.repeat(yo[-1:], pad, 0)])
    cx0 = xo.reshape(nch, CH, 3).min((1, 2))
    cx1 = xo.reshape(nch, CH, 3).max((1, 2))
    cy0 = yo.reshape(nch, CH, 3).min((1, 2))
    cy1 = yo.reshape(nch, CH, 3).max((1, 2))
    total = 0
    per_tile = []
    for r in range(ty):
        r0, r1 = r * TR, r * TR + TR - 1
        ovr = (cy1 >= r0) & (cy0 <= r1)
        for c in range(tx):
            c0, c1 = c * TC, c * TC + TC - 1
            ov = ovr & (cx1 >= c0) & (cx0 <= c1)
            n = int(ov.sum())
            total += n
            per_tile.append(n)
    print(f"{order_name:10s} chunk-tile incidences={total:5d}  "
          f"max/tile={max(per_tile):4d}  mean/tile={total/len(per_tile):6.1f}")
    return total


def main():
    from smirk_tpu import assets
    from smirk_tpu.assets import keep_vertices_and_update_faces

    bundle = assets.load_all()
    faces = np.asarray(bundle["faces"], np.int64)
    render_faces, kept = keep_vertices_and_update_faces(
        faces, np.asarray(bundle["face_vertex_ids"]))
    vt = np.asarray(bundle["v_template"], np.float32)[kept]
    # center like bench.py so the face fills the frame at cam scale 7
    vt = vt - vt.mean(0)
    F = len(render_faces)
    H = W = 224
    scale = 7.0
    # orthographic NDC -> pixels (renderer convention, y flip irrelevant
    # for occupancy)
    v = vt[render_faces]  # (F,3,3)
    x_ndc = scale * v[..., 0]
    y_ndc = scale * v[..., 1]
    px = (x_ndc * W + W - 1.0) / 2.0
    py = (y_ndc * H + H - 1.0) / 2.0

    cent = v.mean(1)  # (F,3)

    # face-level baseline: occupied 32-slot chunks in the compact path =
    # sum over tiles of ceil(faces_in_tile/32)
    ty, tx = 28, 2
    base_chunks = 0
    fx0, fx1 = px.min(1), px.max(1)
    fy0, fy1 = py.min(1), py.max(1)
    for r in range(ty):
        ovr = (fy1 >= r * 8) & (fy0 <= r * 8 + 7)
        for c in range(tx):
            n = int((ovr & (fx1 >= c * 128) & (fx0 <= c * 128 + 127)).sum())
            base_chunks += -(-n // 32)
    print(f"face-level occupied chunks (compact baseline): {base_chunks}")

    analyze("original", np.arange(F), px, py, F)
    analyze("morton3d", np.argsort(morton_key(cent)), px, py, F)
    # screen-space morton (xy only, z high bits) — the raster cares about
    # screen locality
    cent2 = cent.copy()
    cent2[:, 2] *= 0.01
    analyze("morton-xy", np.argsort(morton_key(cent2)), px, py, F)
    # row-major strip order: sort by (quantized y, x)
    qy = np.round((cent[:, 1] - cent[:, 1].min()) * 16)
    order = np.lexsort((cent[:, 0], qy))
    analyze("strips-y", order, px, py, F)


if __name__ == "__main__":
    main()
