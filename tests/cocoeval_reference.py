"""Straight-line reference transcription of the COCOeval protocol (bbox+segm).

An INDEPENDENT oracle for differentially testing padt_tpu.eval.coco_map: this
follows the published pycocotools COCOeval algorithm step by step (per-image
greedy matching at maxDets[-1], accumulate-time [0:maxDet] slicing, mergesort
tie-breaking, try/except-truncated 101-point interpolation), with none of the
vectorized structure of the production evaluator. Slow on purpose; test-only.

The segm path carries its own RLE machinery (string parser + dense
column-major fill + dense-mask IoU), written from the published maskApi format
spec with NO code shared with padt_tpu.eval.rle — so the production codec's
encode, its compressed-domain run-walk IoU (native/maskops.cc), and the segm
mAP protocol are all under differential test at once.

Reference oracle: `/root/reference/eval/evaluation_scripts/eval_coco.py:84-93`
reports COCOeval(...).stats — this module reproduces that algorithm so the
production evaluator can be fuzzed against it without pycocotools installed.
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = [1, 10, 100]
AREA_RNG = [[0.0, 1e10], [0.0, 32.0**2], [32.0**2, 96.0**2], [96.0**2, 1e10]]


# ---------------------------------------------------------------------------
# Independent RLE machinery (segm oracle). Written from the published maskApi
# format spec: column-major runs starting with a zero-run; counts delta-coded
# from the 3rd element; 5-bit groups, LSB first, bit 0x20 = continuation,
# sign-extension when the last group has bit 0x10 set; chars offset by 48.
# Deliberately scalar/slow; shares nothing with padt_tpu.eval.rle.
# ---------------------------------------------------------------------------


def rle_string_to_counts_oracle(s):
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts = []
    pos = 0
    while pos < len(s):
        val, shift = 0, 0
        while True:
            group = ord(s[pos]) - 48
            pos += 1
            val |= (group & 0x1F) << shift
            shift += 5
            if not (group & 0x20):
                if group & 0x10:  # sign-extend the final group
                    val |= -1 << shift
                break
        if len(counts) > 2:
            val += counts[-2]
        counts.append(val)
    return counts


def rle_to_dense_oracle(rle):
    """{'size': [H, W], 'counts': str|list} -> (H, W) bool, column-major fill."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_string_to_counts_oracle(counts)
    mask = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            mask[pos : pos + c] = True
        pos += c
        val = not val
    assert pos <= h * w, (pos, h, w)
    return mask.reshape((w, h)).T  # column-major


def mask_iou_dense_oracle(d_rle, g_rle, crowd):
    dm = rle_to_dense_oracle(d_rle)
    gm = rle_to_dense_oracle(g_rle)
    assert dm.shape == gm.shape, (dm.shape, gm.shape)
    inter = float(np.logical_and(dm, gm).sum())
    union = float(dm.sum()) if crowd else float(np.logical_or(dm, gm).sum())
    return inter / union if union > 0 else 0.0


def mask_area_oracle(rle):
    return float(rle_to_dense_oracle(rle).sum())


def _iou_one(d, g, crowd):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    ix = min(dx + dw, gx + gw) - max(dx, gx)
    iy = min(dy + dh, gy + gh) - max(dy, gy)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def cocoeval_bbox(gts, dts):
    return _cocoeval(gts, dts, "bbox")


def cocoeval_segm(gts, dts):
    """Segm-protocol stats: IoUs from dense decoded masks, detection areas
    from mask areas (pycocotools loadRes for segm results:
    area = maskUtils.area(segmentation)). GT 'area' is taken from the ann as
    given, matching pycocotools (GT areas come from the dataset)."""
    return _cocoeval(gts, dts, "segm")


def _cocoeval(gts, dts, iou_type):
    """gts/dts: lists of COCO-style ann dicts -> the 12 COCOeval stats.

    gt: {image_id, category_id, bbox [x,y,w,h], area, iscrowd, (segmentation)}
    dt: {image_id, category_id, bbox|segmentation, score}
    """
    # ---- _prepare ----
    img_ids = sorted({a["image_id"] for a in gts} | {a["image_id"] for a in dts})
    cat_ids = sorted({a["category_id"] for a in gts} | {a["category_id"] for a in dts})
    _gts, _dts = {}, {}
    for i in img_ids:
        for c in cat_ids:
            _gts[i, c] = []
            _dts[i, c] = []
    for n, g in enumerate(gts):
        g = dict(g)
        g["id"] = n + 1
        g["ignore"] = 1 if g.get("iscrowd", 0) else 0  # pycocotools overwrite
        _gts[g["image_id"], g["category_id"]].append(g)
    for n, d in enumerate(dts):
        d = dict(d)
        d["id"] = n + 1
        if iou_type == "segm":
            d["area"] = mask_area_oracle(d["segmentation"])  # loadRes segm area
        else:
            d["area"] = d["bbox"][2] * d["bbox"][3]  # loadRes bbox area
        _dts[d["image_id"], d["category_id"]].append(d)

    # ---- computeIoU per (img, cat): dts score-sorted (mergesort), top-100 ----
    ious = {}
    for i in img_ids:
        for c in cat_ids:
            gt, dt = _gts[i, c], _dts[i, c]
            inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
            dt = [dt[k] for k in inds[: MAX_DETS[-1]]]
            m = np.zeros((len(dt), len(gt)))
            for di, d in enumerate(dt):
                for gi, g in enumerate(gt):
                    if iou_type == "segm":
                        m[di, gi] = mask_iou_dense_oracle(
                            d["segmentation"], g["segmentation"], bool(g.get("iscrowd", 0))
                        )
                    else:
                        m[di, gi] = _iou_one(d["bbox"], g["bbox"], bool(g.get("iscrowd", 0)))
            ious[i, c] = m

    # ---- evaluateImg(img, cat, aRng, maxDet = maxDets[-1]) ----
    def evaluate_img(img, cat, a_rng, max_det):
        gt, dt = _gts[img, cat], _dts[img, cat]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[k] for k in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[k] for k in dtind[:max_det]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        iou = ious[img, cat][:, gtind] if len(ious[img, cat]) > 0 else ious[img, cat]
        t_n, g_n, d_n = len(IOU_THRS), len(gt), len(dt)
        gtm = np.zeros((t_n, g_n))
        dtm = np.zeros((t_n, d_n))
        gt_ig = np.array([g["_ignore"] for g in gt]) if gt else np.zeros((0,))
        dt_ig = np.zeros((t_n, d_n))
        if len(iou) != 0:
            for ti, thr in enumerate(IOU_THRS):
                for di, d in enumerate(dt):
                    best = min(thr, 1 - 1e-10)
                    m = -1
                    for gi in range(g_n):
                        if gtm[ti, gi] > 0 and not iscrowd[gi]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                            break
                        if iou[di, gi] < best:
                            continue
                        best = iou[di, gi]
                        m = gi
                    if m == -1:
                        continue
                    dt_ig[ti, di] = gt_ig[m]
                    dtm[ti, di] = gt[m]["id"]
                    gtm[ti, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]).reshape(1, d_n)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, t_n, 0)))
        return {
            "dtScores": [d["score"] for d in dt],
            "dtMatches": dtm,
            "dtIgnore": dt_ig,
            "gtIgnore": gt_ig,
        }

    eval_imgs = {
        (img, cat, ai): evaluate_img(img, cat, AREA_RNG[ai], MAX_DETS[-1])
        for cat in cat_ids
        for ai in range(len(AREA_RNG))
        for img in img_ids
    }

    # ---- accumulate ----
    t_n, r_n = len(IOU_THRS), len(REC_THRS)
    k_n, a_n, m_n = len(cat_ids), len(AREA_RNG), len(MAX_DETS)
    precision = -np.ones((t_n, r_n, k_n, a_n, m_n))
    recall = -np.ones((t_n, k_n, a_n, m_n))
    for ki in range(k_n):
        for ai in range(a_n):
            for mi, max_det in enumerate(MAX_DETS):
                es = [eval_imgs[img, cat_ids[ki], ai] for img in img_ids]
                es = [e for e in es if e is not None]
                if len(es) == 0:
                    continue
                dt_scores = np.concatenate([np.asarray(e["dtScores"][:max_det]) for e in es])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate([e["dtMatches"][:, :max_det] for e in es], axis=1)[:, inds]
                dt_ig = np.concatenate([e["dtIgnore"][:, :max_det] for e in es], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in es])
                npig = int(np.count_nonzero(gt_ig == 0))
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for ti in range(t_n):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    nd = len(tp)
                    rc = tp / npig
                    pr = (tp / (fp + tp + np.spacing(1))).tolist()
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0
                    q = [0.0] * r_n
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    srt = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(srt):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[ti, :, ki, ai, mi] = np.array(q)

    # ---- summarize ----
    def summ(ap, iou_thr=None, ai=0, mi=2):
        if ap:
            s = precision
            if iou_thr is not None:
                s = s[np.where(np.abs(IOU_THRS - iou_thr) < 1e-9)[0]]
            s = s[:, :, :, ai, mi]
        else:
            s = recall
            if iou_thr is not None:
                s = s[np.where(np.abs(IOU_THRS - iou_thr) < 1e-9)[0]]
            s = s[:, :, ai, mi]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    return {
        "AP": summ(True),
        "AP50": summ(True, iou_thr=0.5),
        "AP75": summ(True, iou_thr=0.75),
        "AP_small": summ(True, ai=1),
        "AP_medium": summ(True, ai=2),
        "AP_large": summ(True, ai=3),
        "AR1": summ(False, mi=0),
        "AR10": summ(False, mi=1),
        "AR100": summ(False, mi=2),
        "AR_small": summ(False, ai=1),
        "AR_medium": summ(False, ai=2),
        "AR_large": summ(False, ai=3),
    }
