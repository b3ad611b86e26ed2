from .dedup import (
    connected_components,
    dedup_exact,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from .ivf import assign_clusters, ivf_self_search, kmeans_lite
from .joins import (
    asof_join,
    band_join,
    band_join_outer,
    grid_distance_join_2d,
    inequality_join,
    inequality_join_2pred,
    interval_overlap_join,
    naive_theta_join,
    salted_equi_join,
    theta_join,
)
from .multimodal import binary_features, decode_image_stub, with_binary_payload
from .similarity import (
    hyperplane_lsh_pairs,
    knn_cosine_blocked,
    knn_cosine_brute,
    threshold_similarity_blocked,
    threshold_similarity_join,
)

__all__ = [
    "asof_join",
    "assign_clusters",
    "band_join",
    "band_join_outer",
    "binary_features",
    "connected_components",
    "decode_image_stub",
    "dedup_exact",
    "grid_distance_join_2d",
    "hyperplane_lsh_pairs",
    "inequality_join",
    "inequality_join_2pred",
    "interval_overlap_join",
    "ivf_self_search",
    "kmeans_lite",
    "knn_cosine_blocked",
    "knn_cosine_brute",
    "minhash_near_dup_pairs",
    "naive_theta_join",
    "salted_equi_join",
    "simhash_near_dup_pairs",
    "theta_join",
    "threshold_similarity_blocked",
    "threshold_similarity_join",
    "with_binary_payload",
]
