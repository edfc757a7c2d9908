from .fps import fps
from .ball_query import ball_query, ball_query_group, ball_query_group_feats
from .interpolate import (three_nn, gather_points, group_points,
                          three_interpolate, interpolate_features)
from .nn_distance import nn_distance, huber_loss, smoothl1_loss
from .reference import fps_ref, ball_query_ref, three_nn_ref

__all__ = [
    "fps", "ball_query", "ball_query_group", "ball_query_group_feats",
    "three_nn", "gather_points",
    "group_points",
    "three_interpolate", "interpolate_features",
    "nn_distance", "huber_loss",
    "smoothl1_loss", "fps_ref", "ball_query_ref", "three_nn_ref",
]
