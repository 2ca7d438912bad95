"""Independent NumPy oracles replicating the reference CUDA kernel semantics.

Each oracle is written directly from the cited reference kernel's algorithm so
the JAX ops in disprcnn_tpu/ops can be validated against them (SURVEY.md §4).
Deliberately different algorithms where possible (e.g. Sutherland-Hodgman
clipping for rotated IoU vs the op's vertex enumeration).
"""
import numpy as np


def iou_matrix(a, b, to_remove=1.0):
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            lt = np.maximum(a[i, :2], b[j, :2])
            rb = np.minimum(a[i, 2:], b[j, 2:])
            wh = np.clip(rb - lt + to_remove, 0, None)
            inter = wh[0] * wh[1]
            area_a = (a[i, 2] - a[i, 0] + to_remove) * (a[i, 3] - a[i, 1] + to_remove)
            area_b = (b[j, 2] - b[j, 0] + to_remove) * (b[j, 3] - b[j, 1] + to_remove)
            out[i, j] = inter / (area_a + area_b - inter)
    return out


def greedy_nms(boxes, scores, thresh, to_remove=1.0):
    """Reference csrc/cuda/nms.cu semantics: sort by score, suppress IoU > thresh."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = iou_matrix(boxes, boxes, to_remove)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and iou[i, j] > thresh:
                suppressed[j] = True
    return sorted(keep)


def bev_to_polygon(bev):
    cx, cy = (bev[0] + bev[2]) / 2, (bev[1] + bev[3]) / 2
    hw, hh = (bev[2] - bev[0]) / 2, (bev[3] - bev[1]) / 2
    ry = bev[4]
    c, s = np.cos(ry), np.sin(ry)
    pts = []
    for dx, dy in [(hw, hh), (-hw, hh), (-hw, -hh), (hw, -hh)]:
        pts.append((cx + dx * c - dy * s, cy + dx * s + dy * c))
    return np.array(pts)


def polygon_clip(subject, clip):
    """Sutherland-Hodgman clipping of polygon `subject` by convex `clip`."""

    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def intersect(p1, p2, a, b):
        d1 = np.array(p2) - np.array(p1)
        d2 = np.array(b) - np.array(a)
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return (p1[0] + t * d1[0], p1[1] + t * d1[1])

    # clip polygon must be counter-clockwise
    cl = list(clip)
    u = np.array(cl[1]) - np.array(cl[0])
    v = np.array(cl[2]) - np.array(cl[1])
    if u[0] * v[1] - u[1] * v[0] < 0:
        cl = cl[::-1]
    out = list(subject)
    for i in range(len(cl)):
        a, b = cl[i], cl[(i + 1) % len(cl)]
        inp, out = out, []
        if not inp:
            return []
        for j in range(len(inp)):
            cur, prev = inp[j], inp[j - 1]
            if inside(cur, a, b):
                if not inside(prev, a, b):
                    out.append(intersect(prev, cur, a, b))
                out.append(tuple(cur))
            elif inside(prev, a, b):
                out.append(intersect(prev, cur, a, b))
    return out


def polygon_area(pts):
    if len(pts) < 3:
        return 0.0
    pts = np.array(pts)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def bev_overlap(bev_a, bev_b):
    pa, pb = bev_to_polygon(bev_a), bev_to_polygon(bev_b)
    return polygon_area(polygon_clip(pa, pb))


def fps(xyz, npoint):
    n = len(xyz)
    idx = [0]
    mind = np.full(n, 1e10)
    for _ in range(npoint - 1):
        d = np.sum((xyz - xyz[idx[-1]]) ** 2, axis=1)
        mind = np.minimum(mind, d)
        idx.append(int(np.argmax(mind)))
    return np.array(idx)


def ball_query(centers, pts, radius, nsample):
    m = len(centers)
    out = np.zeros((m, nsample), np.int64)
    for i in range(m):
        cnt = 0
        for k in range(len(pts)):
            if np.sum((pts[k] - centers[i]) ** 2) < radius * radius:
                if cnt == 0:
                    out[i, :] = k
                out[i, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return out


def roi_align(feat, box, pooled, scale, s):
    """feat (H, W, C); legacy maskrcnn-benchmark semantics with static grid s."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = box * scale
    rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
    bw, bh = rw / pooled, rh / pooled
    out = np.zeros((pooled, pooled, c))
    for ph in range(pooled):
        for pw in range(pooled):
            acc = np.zeros(c)
            for iy in range(s):
                y = y1 + ph * bh + (iy + 0.5) * bh / s
                for ix in range(s):
                    x = x1 + pw * bw + (ix + 0.5) * bw / s
                    acc += bilinear(feat, y, x)
            out[ph, pw] = acc / (s * s)
    return out


def bilinear(feat, y, x):
    h, w, c = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c)
    y, x = max(y, 0), max(x, 0)
    y0, x0 = int(y), int(x)
    if y0 >= h - 1:
        y0 = y1 = h - 1
        y = y0
    else:
        y1 = y0 + 1
    if x0 >= w - 1:
        x0 = x1 = w - 1
        x = x0
    else:
        x1 = x0 + 1
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def pts_in_box3d(pts, box, max_dis=10.0):
    cx, by, cz, h, w, l, ry = box
    cy = by - h / 2.0
    out = np.zeros(len(pts), bool)
    for i, (x, y, z) in enumerate(pts):
        if abs(x - cx) > max_dis or abs(y - cy) > h / 2.0 or abs(z - cz) > max_dis:
            continue
        ca, sa = np.cos(ry), np.sin(ry)
        xr = (x - cx) * ca - (z - cz) * sa
        zr = (x - cx) * sa + (z - cz) * ca
        out[i] = (-l / 2 <= xr <= l / 2) and (-w / 2 <= zr <= w / 2)
    return out
