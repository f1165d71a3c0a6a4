"""Physical-plan assertions: the 'is this the plan I'd want at 100 TB'
checks, runnable in tests and during development.

These formalize the scale requirements as executable checks:
  * dimension joins must broadcast (no shuffle on the big side),
  * parquet scans must push filters and prune columns,
  * no row-at-a-time Python (BatchEvalPython) anywhere — only Arrow
    (ArrowEvalPython / MapInPandas) is allowed on the hot path,
  * whole-stage codegen must cover the native expression pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    # after execution an AQE plan prints BOTH the Final and the Initial
    # (pre-adaptive) tree; assertions are about what actually ran — keep
    # the final tree and only the detail blocks its node ids reference
    marker = "== Initial Plan =="
    if marker not in plan:
        return plan
    import re

    tree_end = plan.index("\n\n")
    tree, details = plan[:tree_end], plan[tree_end:]
    final_tree = tree.split(marker)[0]
    final_ids = set(re.findall(r"\((\d+)\)", final_tree))
    blocks = re.split(r"\n(?=\(\d+\) )", details)
    kept = []
    for block in blocks:
        m = re.match(r"\((\d+)\) ", block)
        if m is None or m.group(1) in final_ids:
            kept.append(block)
    return final_tree + "\n".join(kept)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in:\n" + plan
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "unexpected shuffle join in:\n" + plan
    )


def assert_pushed_filters(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
        "expected non-empty PushedFilters in:\n" + plan
    )


def assert_column_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    plan = physical_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, "no ReadSchema in plan:\n" + plan
    for col in must_not_read:
        assert all(col not in l for l in read_schema), (
            f"column {col} not pruned from scan: {read_schema}"
        )


def assert_arrow_only_python(df: DataFrame) -> None:
    """Hard rule (north_star): no row-at-a-time Python on the hot path."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, (
        "row-at-a-time Python UDF found (BatchEvalPython):\n" + plan
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan — the scale currency.
    Counts physical Exchange nodes (broadcast exchanges excluded: they
    move only the small side)."""
    import re

    plan = physical_plan(df)
    # formatted explain lists each node twice (tree + detail); count only
    # the detail headers "(N) Exchange"
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def count_codegen_stages(df: DataFrame) -> int:
    # with AQE on, codegen ids only appear in the formatted explain of the
    # *final* plan — force execution first, then parse the codegen ids
    import re

    df.collect()
    plan = physical_plan(df)
    return len(set(re.findall(r"codegen id : (\d+)", plan)))
