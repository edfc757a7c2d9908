"""Greedy axis-aligned NMS (host numpy), matching utils/nms.py semantics:
score-descending greedy pick, suppress by (old-type: inter/area_j, else
IoU) > threshold; samecls variant only suppresses same-class pairs."""
from __future__ import annotations

import numpy as np


def _nms(mins, maxs, score, overlap_threshold, old_type, cls=None):
    dims = maxs - mins
    area = np.prod(dims, axis=1)
    order = np.argsort(score)
    pick = []
    while order.size != 0:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        lo = np.maximum(mins[i], mins[rest])
        hi = np.minimum(maxs[i], maxs[rest])
        inter = np.prod(np.maximum(0.0, hi - lo), axis=1)
        if old_type:
            o = inter / area[rest]
        else:
            o = inter / (area[i] + area[rest] - inter)
        if cls is not None:
            o = o * (cls[rest] == cls[i])
        order = np.delete(order, np.concatenate(
            ([order.size - 1], np.where(o > overlap_threshold)[0])))
    return pick


def nms_2d_faster(boxes, overlap_threshold, old_type=False):
    """boxes (n,5): x1,y1,x2,y2,score."""
    return _nms(boxes[:, [0, 1]], boxes[:, [2, 3]], boxes[:, 4],
                overlap_threshold, old_type)


def nms_3d_faster(boxes, overlap_threshold, old_type=False):
    """boxes (n,7): x1,y1,z1,x2,y2,z2,score."""
    return _nms(boxes[:, :3], boxes[:, 3:6], boxes[:, 6],
                overlap_threshold, old_type)


def nms_3d_faster_samecls(boxes, overlap_threshold, old_type=False):
    """boxes (n,8): x1,y1,z1,x2,y2,z2,score,cls."""
    return _nms(boxes[:, :3], boxes[:, 3:6], boxes[:, 6],
                overlap_threshold, old_type, cls=boxes[:, 7])
