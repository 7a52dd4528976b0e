from covid19i2b2_spark.plans.explain import (  # noqa: F401
    assert_broadcast_hash_join,
    assert_no_nested_loop,
    assert_take_ordered,
    physical_plan,
    pushed_filters,
)
