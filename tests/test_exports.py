"""Public package surface: every name in operators.__all__ resolves, and
the sampler/packing/cumsum additions are importable from their packages
(a user discovering the library through the package surface sees them)."""


def test_operators_all_resolves():
    import cassandra_util_spark.operators as ops

    missing = [n for n in ops.__all__ if not hasattr(ops, n)]
    assert not missing, missing


def test_sampler_family_importable_from_operators():
    from cassandra_util_spark.operators import (  # noqa: F401
        bottomk_merge,
        bottomk_sample,
        bottomk_sample_grouped,
        padding_waste_report,
        sample_quantiles,
        sample_quantiles_grouped,
        weighted_bottomk_sample,
        weighted_bottomk_sample_grouped,
        weighted_bottomk_sample_logcost,
    )


def test_cumsum_importable_from_functions():
    from cassandra_util_spark.functions.cumsum import (  # noqa: F401
        distributed_cumsum,
        token_budget_cut,
    )
