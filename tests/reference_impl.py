"""Plain-numpy/cv2/scipy replicas of the reference's math, used as golden
oracles in unit tests.  Each function re-states the published algorithm from
the cited reference location (see docstrings); these are test-only.
"""

import cv2
import numpy as np
from scipy.ndimage import maximum_filter


def ref_get_affine_transform(center, scale, rot, output_size,
                             shift=np.array([0, 0], dtype=np.float32), inv=0):
    """transforms.py:753-786: 3-point cv2.getAffineTransform solve."""
    def get_3rd_point(a, b):
        direct = a - b
        return b + np.array([-direct[1], direct[0]], dtype=np.float32)

    def get_dir(src_point, rot_rad):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return [src_point[0] * cs - src_point[1] * sn,
                src_point[0] * sn + src_point[1] * cs]

    scale_tmp = np.array(scale, dtype=np.float32)
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    src_dir = get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = get_3rd_point(dst[0, :], dst[1, :])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def ref_box_to_center_scale(x, y, w, h, aspect_ratio, scale_mult=1.25):
    """bbox.py:197-216."""
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w, h], dtype=np.float32) * scale_mult
    return center, scale


def ref_heatmap_to_coord_simple(hms, bbox):
    """transforms.py:550-583 (argmax + subpixel + inverse affine)."""
    K, H, W = hms.shape
    flat = hms.reshape(K, -1)
    maxvals = flat.max(axis=1).reshape(K, 1)
    idx = flat.argmax(axis=1)
    coords = np.stack([idx % W, idx // W], axis=1).astype(np.float32)
    coords *= (maxvals > 0).astype(np.float32)
    for p in range(K):
        hm = hms[p]
        px = int(round(float(coords[p][0])))
        py = int(round(float(coords[p][1])))
        if 1 < px < W - 1 and 1 < py < H - 1:
            diff = np.array((hm[py][px + 1] - hm[py][px - 1],
                             hm[py + 1][px] - hm[py - 1][px]))
            coords[p] += np.sign(diff) * .25
    xmin, ymin, xmax, ymax = bbox
    w, h = xmax - xmin, ymax - ymin
    center = np.array([xmin + w * 0.5, ymin + h * 0.5])
    scale = np.array([w, h])
    trans = ref_get_affine_transform(center, scale, 0, [W, H], inv=1)
    preds = np.zeros_like(coords)
    for i in range(K):
        pt = np.array([coords[i][0], coords[i][1], 1.0])
        preds[i] = (trans @ pt)[:2]
    return preds, maxvals


def ref_target_generator(joints_3d, num_joints, hm_size, sigma, feat_stride):
    """simple_transform.py:122-158."""
    H, W = hm_size
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_3d[:, 0, 1]
    target = np.zeros((num_joints, H, W), dtype=np.float32)
    tmp_size = sigma * 3
    for i in range(num_joints):
        mu_x = int(joints_3d[i, 0, 0] / feat_stride[0] + 0.5)
        mu_y = int(joints_3d[i, 1, 0] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if (ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0):
            target_weight[i] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * (sigma ** 2)))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if target_weight[i] > 0.5:
            target[i, img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def ref_compute_oks(bb, predkpts, gtkpts, variances):
    """al_metric.py:42-69."""
    d, g = np.array(predkpts), np.array(gtkpts)
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    k1 = np.count_nonzero(vg > 0)
    x0 = bb[0] - bb[2]; x1 = bb[0] + bb[2] * 2
    y0 = bb[1] - bb[3]; y1 = bb[1] + bb[3] * 2
    body_area = bb[2] * bb[3]
    xd, yd = d[0::3], d[1::3]
    K = len(variances)
    if k1 > 0:
        dx = xd - xg
        dy = yd - yg
    else:
        z = np.zeros((K,))
        dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
        dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
    e_vec = (dx ** 2 + dy ** 2) / variances / (body_area + np.spacing(1)) * 0.5
    if k1 > 0:
        e_vec = e_vec[vg > 0]
    return np.sum(np.exp(-e_vec)) / e_vec.shape[0]


def ref_localpeak_mean(heatmaps, filter_size=3, order=0.5):
    """local_peak.py:5-22."""
    vals = []
    for image in heatmaps:
        local_max = maximum_filter(
            image, footprint=np.ones((filter_size, filter_size)),
            mode="constant")
        peaks = image[image == local_max]
        thr = peaks.max() * order
        vals.append(peaks[peaks >= thr])
    return np.hstack(vals).mean()


def ref_peak_local_max(image, min_distance=5, num_peaks=5):
    """skimage.feature.peak_local_max semantics as exercised by the
    reference (ActiveLearning.py:770): square footprint 2d+1, constant-0
    border in the max filter, strictly above the global min, 5-pixel border
    exclusion, descending-intensity order with min-distance suppression."""
    size = 2 * min_distance + 1
    mf = maximum_filter(image, size=size, mode="constant", cval=0.0)
    mask = (image == mf) & (image > image.min())
    mask[:min_distance, :] = False
    mask[-min_distance:, :] = False
    mask[:, :min_distance] = False
    mask[:, -min_distance:] = False
    coords = np.argwhere(mask)
    if len(coords) == 0:
        return np.zeros((0, 2), int)
    vals = image[coords[:, 0], coords[:, 1]]
    order_idx = np.argsort(-vals, kind="stable")
    coords = coords[order_idx]
    kept = []
    for c in coords:
        if all(max(abs(c[0] - k[0]), abs(c[1] - k[1])) > min_distance
               for k in kept):
            kept.append(c)
        if len(kept) == num_peaks:
            break
    return np.array(kept)


def ref_compute_mpe(heatmaps):
    """ActiveLearning.py:762-778."""
    from scipy.special import softmax
    from scipy.stats import entropy
    mpe = 0.0
    for heatmap in heatmaps:
        loc = ref_peak_local_max(heatmap, 5, 5)
        if len(loc) == 0:
            continue
        peaks = heatmap[loc[:, 0], loc[:, 1]]
        if peaks.shape[0] > 0:
            mpe += entropy(softmax(peaks))
    return mpe


def ref_compute_margin(heatmaps):
    """ActiveLearning.py:780-788."""
    margin = 0.0
    for heatmap in heatmaps:
        loc = ref_peak_local_max(heatmap, 5, 5)
        if len(loc) > 1:
            peaks = heatmap[loc[:, 0], loc[:, 1]]
            margin += np.linalg.norm(peaks[0] - peaks[1])
    return margin


def ref_compute_hybrid(bbox, keypoints, angle_triangles):
    """hybrid_feature.py:14-61 on an arbitrary keypoint subset."""
    height = bbox[3]
    x = np.array(keypoints[0::3], dtype=np.float64)
    y = np.array(keypoints[1::3], dtype=np.float64)
    s = np.array(keypoints[2::3], dtype=np.float64)
    cg_x = np.average(x, weights=s)
    cg_y = np.average(y, weights=s)
    nx = (x - cg_x) / height
    ny = (y - cg_y) / height
    eps = 1e-6
    ang = np.zeros(len(angle_triangles))
    for i, (a, b, c) in enumerate(angle_triangles):
        m1 = (y[b] - y[a]) / (x[b] - x[a] + eps)
        m2 = (y[c] - y[b]) / (x[c] - x[b] + eps)
        ang[i] = np.arctan(np.abs((m1 - m2) / (1 + m1 * m2 + eps)))
    return np.hstack([nx, ny, ang])
