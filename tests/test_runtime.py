"""Unit tests for the cluster-sizing helpers (pure logic, Ray session)."""


def test_auto_pool_caps_below_cpu_count(ray_session):
    import ray

    from hydro_raster_ray.runtime import auto_pool

    cpus = int(ray.cluster_resources()["CPU"])
    assert auto_pool(cpus) <= cpus - 2 or cpus <= 3
    assert auto_pool(1) == 1
    lo, hi = auto_pool((1, cpus * 4))
    assert lo >= 1 and hi <= max(1, cpus - 2)


def test_tune_context_lowers_read_floor(ray_session):
    import ray
    from ray.data import DataContext

    from hydro_raster_ray.runtime import tune_context

    ctx = DataContext.get_current()
    old = ctx.read_op_min_num_blocks
    ctx.read_op_min_num_blocks = 200
    try:
        tune_context()
        cpus = int(ray.cluster_resources()["CPU"])
        assert ctx.read_op_min_num_blocks == max(16, 2 * cpus)
        # never RAISES an already-lower floor
        ctx.read_op_min_num_blocks = 4
        tune_context()
        assert ctx.read_op_min_num_blocks == 4
    finally:
        ctx.read_op_min_num_blocks = old
