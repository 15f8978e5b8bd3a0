from tpurt.accel.bvh import (  # noqa: F401
    BVHNodes,
    build_bvh,
    bvh_stats,
    thread_links,
    validate_bvh,
)
