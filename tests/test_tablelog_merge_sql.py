"""The MERGE INTO SQL surface (r11, VERDICT r10 #7): parse the
Delta-shaped statement, build the change frame with Spark SQL itself,
and dispatch to the CoW/MoR merge writers — same key-unique
precondition, probe, constraint gate, and conflict policy."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from cdc_local_data_pipeline_docker_spark.sources import tablelog as TL


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tablelog_merge_sql_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def table(spark, root):
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(10)],
        "k LONG, val LONG, tag STRING",
    )
    TL.log_append(spark, root, df)
    spark.createDataFrame(
        [(1, 111, "B"), (2, 222, "B"), (100, 5, "N")],
        "k LONG, val LONG, tag STRING",
    ).createOrReplaceTempView("merge_sql_chg")
    return root


def _state(spark, root):
    return {r.k: (r.val, r.tag) for r in TL.log_read(spark, root).collect()}


def test_upsert_star_form(spark, table):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_chg AS s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = _state(spark, table)
    assert got[1] == (111, "B") and got[2] == (222, "B")
    assert got[100] == (5, "N")
    assert got[3] == (30, "A") and len(got) == 11


def test_explicit_assignments_and_partial_insert_mor(spark, table):
    """Assignments reference BOTH aliases; partial INSERT fills the
    unlisted column with NULL; mor=True goes through the DV writer."""
    spark.createDataFrame(
        [(3, 7), (200, 9)], "k LONG, val LONG"
    ).createOrReplaceTempView("merge_sql_chg2")
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg2 s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET val = t.val + s.val, tag = 'U'
            WHEN NOT MATCHED THEN INSERT (k, val) VALUES (s.k, s.val * 2)""",
        mor=True,
    )
    got = _state(spark, table)
    assert got[3] == (37, "U")
    assert got[200] == (18, None)
    assert len(got) == 11
    assert TL._read_manifest(table, 1)["action"] == "merge_mor"


def test_subquery_source_update_only(spark, table):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t
            USING (SELECT 4 AS k, 999 AS val, 'Q' AS tag) AS s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *""",
    )
    got = _state(spark, table)
    assert got[4] == (999, "Q") and len(got) == 10


def test_insert_only_leaves_matched_untouched(spark, table):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_chg AS s
            ON t.k = s.k
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = _state(spark, table)
    assert got[1] == (10, "A")  # matched key untouched
    assert got[100] == (5, "N") and len(got) == 11


def test_constraint_gate_applies_through_sql(spark, table):
    """The SQL path dispatches to the same writer: a violating merge
    raises and publishes nothing."""
    TL.log_add_constraint(spark, table, "val_pos", "val >= 0")
    spark.createDataFrame(
        [(1, -5, "X")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("merge_sql_bad")
    v = TL._latest_version(table)
    with pytest.raises(TL.ConstraintViolation):
        TL.log_merge_sql(
            spark,
            f"""MERGE INTO `{table}` t USING merge_sql_bad s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET *""",
        )
    assert TL._latest_version(table) == v


def test_unsupported_forms_raise(spark, table):
    for bad, match in [
        (
            f"MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.val "
            "WHEN MATCHED THEN UPDATE SET *",
            "different columns",
        ),
        ("SELECT 1", "unsupported MERGE syntax"),
        (
            f"MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET nope = 1",
            "not a column",
        ),
        (
            f"MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k "
            "WHEN NOT MATCHED THEN DELETE",
            "WHEN NOT MATCHED supports INSERT",
        ),
        (
            f"MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k "
            "WHEN MATCHED THEN INSERT *",
            "WHEN MATCHED supports UPDATE/DELETE",
        ),
    ]:
        with pytest.raises(ValueError, match=match):
            TL.log_merge_sql(spark, bad)


def test_update_and_delete_sql_statements(spark, root):
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(10)],
        "k LONG, val LONG, tag STRING",
    )
    TL.log_append(spark, root, df)
    TL.log_update_sql(
        spark, f"UPDATE `{root}` SET val = val + 1, tag = 'U' WHERE k % 2 = 0"
    )
    got = _state(spark, root)
    assert got[0] == (1, "U") and got[1] == (10, "A")
    TL.log_delete_sql(spark, f"DELETE FROM `{root}` WHERE k >= 8", mor=True)
    assert set(_state(spark, root)) == set(range(8))
    assert TL._read_manifest(root, 2)["action"] == "delete_mor"
    # WHERE-less forms: update-all then delete-all (legal, zero rows)
    TL.log_update_sql(spark, f"UPDATE `{root}` SET tag = 'Z'")
    assert {t for _v, t in _state(spark, root).values()} == {"Z"}
    TL.log_delete_sql(spark, f"DELETE FROM `{root}`")
    assert TL.log_read(spark, root).count() == 0
    for bad in ("UPDATE x SET a=1", "DELETE `"):
        with pytest.raises(ValueError, match="unsupported"):
            (TL.log_update_sql if bad.startswith("U") else TL.log_delete_sql)(
                spark, bad
            )


def test_not_matched_by_source_delete_full_sync(spark, table):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the table's new content
    is fully determined — matched rows (updated or passed through) plus
    inserts; unmatched-by-source target rows die. One atomic replace
    commit; history stays time-travelable."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_chg AS s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    # table := source (full sync)
    assert _state(spark, table) == {1: (111, "B"), 2: (222, "B"),
                                    100: (5, "N")}
    assert TL.log_read(spark, table, version=0).count() == 10


def test_by_source_delete_without_update_passes_matched_through(
    spark, table
):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_chg AS s
            ON t.k = s.k
            WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    # matched keys keep their ORIGINAL images; everything else dies;
    # nothing is inserted (no insert clause)
    assert _state(spark, table) == {1: (10, "A"), 2: (20, "A")}


def test_conditional_matched_clauses_first_match_wins(spark, table):
    """WHEN MATCHED AND <cond>: only firing rows update (non-firing
    matched rows pass through untouched and emit no change images);
    several MATCHED clauses compose first-match-wins in ANSI order."""
    spark.createDataFrame(
        [(1, 111, "B"), (2, 222, "B"), (3, 333, "B")],
        "k LONG, val LONG, tag STRING",
    ).createOrReplaceTempView("merge_sql_cond")
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_cond AS s
            ON t.k = s.k
            WHEN MATCHED AND t.k = 1 THEN UPDATE SET val = s.val, tag = 'ONE'
            WHEN MATCHED AND s.val > 200 THEN UPDATE SET *""",
    )
    got = _state(spark, table)
    assert got[1] == (111, "ONE")   # first clause wins for k=1
    assert got[2] == (222, "B")     # second clause
    assert got[3] == (333, "B")     # second clause (s.val=333 > 200)
    assert len(got) == 10
    # k=1 fired clause 1 even though clause 2 also matched: tag is ONE
    # CDF: the commit's change volume is the firing rows only
    add, rem = TL.log_changes(spark, table, 1)
    assert rem.count() == 3 and add.count() == 3


def test_conditional_matched_no_fire_is_noop_for_row(spark, table):
    spark.createDataFrame(
        [(1, -1, "X")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("merge_sql_nofire")
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_nofire s ON t.k = s.k
            WHEN MATCHED AND s.val > 0 THEN UPDATE SET *""",
    )
    assert _state(spark, table)[1] == (10, "A")  # untouched
    add, rem = TL.log_changes(spark, table, 1)
    assert (add is None or add.count() == 0) and (
        rem is None or rem.count() == 0
    )


def test_conditional_insert_clause(spark, table):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN NOT MATCHED AND s.val < 100 THEN INSERT *""",
    )
    got = _state(spark, table)
    assert got[100] == (5, "N")  # s.val=5 < 100 inserts
    assert len(got) == 11        # matched rows untouched, one insert


def test_conditional_clauses_in_full_sync(spark, table):
    """Under BY SOURCE DELETE, matched rows that fire NO clause still
    SURVIVE (pass through) — only unmatched-by-source rows die."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` AS t USING merge_sql_chg AS s
            ON t.k = s.k
            WHEN MATCHED AND s.val > 200 THEN UPDATE SET *
            WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    got = _state(spark, table)
    # k=1 matched but did not fire (111 <= 200): survives UNTOUCHED;
    # k=2 fired; k=100 unmatched-target (no insert clause): not added
    assert got == {1: (10, "A"), 2: (222, "B")}


def test_unknown_clause_rejected(spark, table):
    with pytest.raises(ValueError, match="unsupported MERGE action"):
        TL.log_merge_sql(
            spark,
            f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
                WHEN MATCHED THEN FROBNICATE""",
        )


def test_matched_delete_unconditional(spark, table):
    """WHEN MATCHED THEN DELETE (VERDICT r11 #5): matched target rows
    die, everything else passes through — one content-replace commit."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN MATCHED THEN DELETE""",
    )
    got = _state(spark, table)
    assert 1 not in got and 2 not in got
    assert len(got) == 8 and got[3] == (30, "A")
    assert TL.log_read(spark, table, version=0).count() == 10


def test_matched_delete_and_update_first_match_wins(spark, table):
    """Mixed MATCHED clauses in ANSI order: a row firing the DELETE
    clause first dies even if a later UPDATE clause also matches."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN MATCHED AND t.k = 1 THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = _state(spark, table)
    assert 1 not in got            # first clause (DELETE) won for k=1
    assert got[2] == (222, "B")    # second clause updated k=2
    assert got[100] == (5, "N")    # insert
    assert got[3] == (30, "A") and len(got) == 10


def test_multi_column_on_key(spark, root):
    """Composite ON keys (VERDICT r11 #5): every conjunct an equi-key;
    the writers join on the full column list."""
    df = spark.createDataFrame(
        [(k, k % 2, k * 10, "A") for k in range(8)],
        "k LONG, g LONG, val LONG, tag STRING",
    )
    TL.log_append(spark, root, df)
    spark.createDataFrame(
        [(1, 1, 111, "B"), (2, 1, 222, "B"), (50, 0, 5, "N")],
        "k LONG, g LONG, val LONG, tag STRING",
    ).createOrReplaceTempView("merge_sql_mk")
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{root}` t USING merge_sql_mk s
            ON t.k = s.k AND t.g = s.g
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = {(r.k, r.g): (r.val, r.tag)
           for r in TL.log_read(spark, root).collect()}
    assert got[(1, 1)] == (111, "B")   # both keys matched -> update
    assert got[(2, 1)] == (222, "B")   # (2,0) exists; (2,1) is an insert
    assert got[(2, 0)] == (20, "A")
    assert got[(50, 0)] == (5, "N") and len(got) == 10


def test_case_when_in_set_expression(spark, table):
    """ADVICE r11: a SET expression containing CASE WHEN ... END must
    not be mis-split as a clause boundary."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET
                val = CASE WHEN s.val > 200 THEN s.val ELSE t.val END,
                tag = 'C'
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = _state(spark, table)
    assert got[1] == (10, "C")     # 111 <= 200: val kept, tag set
    assert got[2] == (222, "C")    # 222 > 200: val taken
    assert got[100] == (5, "N")


def test_case_when_in_matched_condition(spark, table):
    """ADVICE r11: CASE WHEN inside a clause CONDITION parses too."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN MATCHED AND CASE WHEN s.val > 200 THEN true
                             ELSE false END THEN UPDATE SET *""",
    )
    got = _state(spark, table)
    assert got[1] == (10, "A") and got[2] == (222, "B")


def test_duplicate_source_keys_raise(spark, table):
    """ADVICE r11: a source with duplicate merge keys would silently
    duplicate target rows — Delta raises, so do we (both branches)."""
    spark.createDataFrame(
        [(1, 111, "B"), (1, 999, "C")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("merge_sql_dup")
    v = TL._latest_version(table)
    for clauses in (
        "WHEN MATCHED THEN UPDATE SET *",
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    ):
        with pytest.raises(ValueError, match="multiple source rows"):
            TL.log_merge_sql(
                spark,
                f"MERGE INTO `{table}` t USING merge_sql_dup s "
                f"ON t.k = s.k {clauses}",
            )
    assert TL._latest_version(table) == v  # nothing published


def test_duplicate_source_keys_matching_nothing_pass(spark, table):
    """ADVICE r12: Delta's 'multiple source rows matched' fires only
    when a duplicated key ACTUALLY matches a target row — duplicates
    on keys absent from the target are legal: ignored by MATCHED
    clauses, inserted (both rows) by NOT MATCHED."""
    spark.createDataFrame(
        [(100, 111, "B"), (100, 999, "C")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("merge_sql_dup_nomatch")
    TL.log_merge_sql(
        spark,
        f"MERGE INTO `{table}` t USING merge_sql_dup_nomatch s "
        f"ON t.k = s.k WHEN MATCHED THEN UPDATE SET *",
    )
    assert _state(spark, table)[1] == (10, "A")  # untouched, no raise
    TL.log_merge_sql(
        spark,
        f"MERGE INTO `{table}` t USING merge_sql_dup_nomatch s "
        f"ON t.k = s.k WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *",
    )
    got = TL.log_read(spark, table).filter("k = 100").collect()
    assert sorted(r.val for r in got) == [111, 999]  # both inserted


def test_by_source_update(spark, table):
    """WHEN NOT MATCHED BY SOURCE THEN UPDATE SET (Delta form): rows
    absent from the source get the SET applied; matched rows keep their
    clause semantics."""
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN UPDATE SET tag = 'STALE'""",
    )
    got = _state(spark, table)
    assert got[1] == (111, "B") and got[2] == (222, "B")
    assert got[3] == (30, "STALE") and got[0] == (0, "STALE")
    assert got[7] == (70, "A")   # condition did not fire: untouched
    assert len(got) == 10        # no insert clause, nothing dies


def test_multiple_insert_clauses_first_match_wins(spark, table):
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_chg s ON t.k = s.k
            WHEN NOT MATCHED AND s.val < 100 THEN INSERT (k, val, tag)
                 VALUES (s.k, s.val, 'SMALL')
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = _state(spark, table)
    assert got[100] == (5, "SMALL")  # first clause wins (5 < 100)
    assert len(got) == 11


@pytest.mark.slow
def test_lineage_survives_delete_capable_merge(spark, root):
    """The content-replace branch honors the row-lineage contract
    (r12): surviving/updated rows keep their ids through the full
    rewrite; inserts draw fresh ones."""
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(6)],
        "k LONG, val LONG, tag STRING",
    )
    TL.log_append(spark, root, df.coalesce(1).sortWithinPartitions("k"))
    TL.log_enable_row_lineage(root)
    before = {
        r.k: r._row_id
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    spark.createDataFrame(
        [(1, 111, "B"), (50, 5, "N")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("merge_sql_lin")
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{root}` t USING merge_sql_lin s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND t.k = 0 THEN DELETE""",
    )
    after = {
        r.k: r._row_id
        for r in TL.log_read_with_row_ids(spark, root).collect()
    }
    assert 0 not in after
    for k in (1, 2, 3, 4, 5):  # survivors + updated keep their ids
        assert after[k] == before[k], k
    assert after[50] not in set(before.values())  # insert: fresh id


def test_log_sql_routes_every_statement_kind(spark, root):
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(12)],
        "k LONG, val LONG, tag STRING",
    )
    TL.log_append(spark, root, df.repartition(4))
    spark.createDataFrame(
        [(1, 111, "B"), (300, 1, "N")], "k LONG, val LONG, tag STRING"
    ).createOrReplaceTempView("log_sql_chg")
    v = TL.log_sql(
        spark,
        f"""MERGE INTO `{root}` t USING log_sql_chg s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert v == 1
    TL.log_sql(spark, f"UPDATE `{root}` SET tag = 'U' WHERE k = 2")
    TL.log_sql(spark, f"DELETE FROM `{root}` WHERE k = 3", mor=True)
    got = _state(spark, root)
    assert got[1] == (111, "B") and got[2] == (20, "U")
    assert 3 not in got and got[300] == (1, "N")
    # OPTIMIZE bin-packs; ZORDER form rewrites clustered
    TL.log_sql(spark, f"OPTIMIZE `{root}`")
    TL.log_sql(spark, f"OPTIMIZE `{root}` ZORDER BY (k, val)")
    assert _state(spark, root) == got
    # DESCRIBE forms
    hist = TL.log_sql(spark, f"DESCRIBE HISTORY `{root}`")
    assert [h["action"] for h in hist[:2]] == ["append", "merge"]
    detail = TL.log_sql(spark, f"DESCRIBE DETAIL `{root}`")
    assert detail["num_files"] >= 1
    # RESTORE by version, then VACUUM dry run vs real
    TL.log_sql(spark, f"RESTORE `{root}` TO VERSION AS OF 1")
    assert 3 in _state(spark, root)
    would = TL.log_sql(spark, f"VACUUM `{root}` DRY RUN")
    assert isinstance(would, list)
    TL.log_sql(spark, f"VACUUM `{root}`")
    with pytest.raises(ValueError, match="unsupported statement"):
        TL.log_sql(spark, "TRUNCATE `x`")
    with pytest.raises(ValueError, match="unsupported OPTIMIZE"):
        TL.log_sql(spark, "OPTIMIZE nobackticks")


def test_alter_table_sql_forms(spark, root):
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(6)], "k LONG, val LONG, tag STRING"
    )
    TL.log_append(spark, root, df)
    TL.log_sql(spark, f"ALTER TABLE `{root}` RENAME COLUMN val TO amount")
    assert set(TL.log_read(spark, root).columns) == {"k", "amount", "tag"}
    TL.log_sql(spark, f"ALTER TABLE `{root}` DROP COLUMN tag")
    assert set(TL.log_read(spark, root).columns) == {"k", "amount"}
    TL.log_sql(
        spark, f"ALTER TABLE `{root}` ADD CONSTRAINT amt_pos CHECK (amount >= 0)"
    )
    with pytest.raises(TL.ConstraintViolation):
        TL.log_append(
            spark, root,
            spark.createDataFrame([(99, -1)], "k LONG, amount LONG"),
        )
    TL.log_sql(spark, f"ALTER TABLE `{root}` DROP CONSTRAINT amt_pos")
    TL.log_append(
        spark, root, spark.createDataFrame([(99, -1)], "k LONG, amount LONG")
    )
    TL.log_sql(
        spark,
        f"ALTER TABLE `{root}` SET TBLPROPERTIES ('row_lineage' = 'true')",
    )
    assert TL._snapshot(root)["props"] == {"row_lineage": True}
    with pytest.raises(ValueError, match="unsupported ALTER"):
        TL.log_sql(spark, f"ALTER TABLE `{root}` FROBNICATE x")


def test_insert_into_and_overwrite_sql(spark, root):
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(4)], "k LONG, val LONG, tag STRING"
    )
    TL.log_append(spark, root, df)
    # VALUES form: positional mapping + cast (col1/col2/col3 names)
    TL.log_sql(
        spark, f"INSERT INTO `{root}` VALUES (10, 1, 'B'), (11, 2, 'B')"
    )
    got = _state(spark, root)
    assert got[10] == (1, "B") and got[11] == (2, "B") and len(got) == 6
    assert TL._read_manifest(root, 1)["action"] == "append"
    # SELECT form
    spark.createDataFrame(
        [(1, 5)], "k LONG, val LONG"
    ).createOrReplaceTempView("__tl_ins_src")
    TL.log_sql(
        spark,
        f"INSERT INTO `{root}` SELECT k + 100, val, 'C' FROM __tl_ins_src",
    )
    got = _state(spark, root)
    assert got[101] == (5, "C") and len(got) == 7
    # OVERWRITE: one atomic content replace, history time-travelable
    TL.log_sql(
        spark, f"INSERT OVERWRITE `{root}` VALUES (7, 70, 'Z')"
    )
    assert _state(spark, root) == {7: (70, "Z")}
    assert len(_state(spark, root)) == 1
    assert TL.log_read(spark, root, version=2).count() == 7
    # arity mismatch raises
    with pytest.raises(ValueError, match="arity"):
        TL.log_sql(spark, f"INSERT INTO `{root}` VALUES (1, 2)")


def test_vacuum_fractional_versions_is_syntax_error(spark, root):
    """ADVICE r12: 'RETAIN 2.5 VERSIONS' must be a clean syntax error
    (decimals are legal only with HOURS), not an int() crash."""
    TL.log_append(
        spark, root, spark.createDataFrame([(1, 1)], "k LONG, v LONG")
    )
    with pytest.raises(ValueError, match="integer"):
        TL.log_sql(spark, f"VACUUM `{root}` RETAIN 2.5 VERSIONS")
    assert TL.log_sql(spark, f"VACUUM `{root}` RETAIN 2.5 HOURS") == []


def test_vacuum_retain_hours(spark, root):
    """VACUUM RETAIN n HOURS (Delta's time-based retention): versions
    inside the window stay time-travelable; a 0-hour window trims to
    the latest version only (their files deleted, manifests removed)."""
    import os

    for i in range(3):
        TL.log_append(
            spark, root,
            spark.createDataFrame([(i, i)], "k LONG, val LONG"),
        )
    TL.log_delete_where(spark, root, "k = 0")
    # a huge window retains everything — nothing deleted
    assert TL.log_sql(spark, f"VACUUM `{root}` RETAIN 24 HOURS") == []
    assert TL.log_read(spark, root, version=0).count() == 1
    # age the old manifests: rewrite their ts two hours back
    import json as J

    for v in TL._versions(root)[:-1]:
        p = os.path.join(TL._log_path(root), TL._manifest_name(v))
        m = J.load(open(p))
        m["ts"] = m["ts"] - 7200
        J.dump(m, open(p, "w"))
    would = TL.log_sql(spark, f"VACUUM `{root}` RETAIN 1 HOURS DRY RUN")
    assert would  # the trimmed versions' unreferenced files would go
    TL.log_sql(spark, f"VACUUM `{root}` RETAIN 1 HOURS")
    assert TL._versions(root) == [3]
    assert {r.k for r in TL.log_read(spark, root).collect()} == {1, 2}


def test_merge_schema_evolution_python_api(spark, root):
    """Schema evolution through the merge WRITERS (r12): a change frame
    with a NEW column extends the table — on a COLUMN-MAPPED table the
    map gains a fresh physical name, so the column surfaces on the
    strict read projection; untouched rows read NULL; old versions keep
    the old schema; the evolved column is renamable."""
    df = spark.createDataFrame(
        [(k, k * 10) for k in range(6)], "k LONG, val LONG"
    )
    TL.log_append(spark, root, df)
    TL.log_rename_column(root, "val", "amount")  # table enters mapping
    ch = spark.createDataFrame(
        [(1, 111, "x"), (50, 5, "y")], "k LONG, amount LONG, note STRING"
    )
    TL.log_merge(spark, root, ch, "k")
    got = {r.k: (r.amount, r.note)
           for r in TL.log_read(spark, root).collect()}
    assert got[1] == (111, "x") and got[50] == (5, "y")
    assert got[2] == (20, None) and len(got) == 7
    assert set(TL.log_read(spark, root, version=1).columns) == {
        "k", "amount"
    }
    TL.log_rename_column(root, "note", "remark")
    assert "remark" in TL.log_read(spark, root).columns
    # MoR merge evolves too (delta files carry the next new column)
    TL.log_merge_mor(
        spark,
        root,
        spark.createDataFrame([(2, 22, None, 7)],
                              "k LONG, amount LONG, remark STRING, w LONG"),
        "k",
    )
    got = {r.k: (r.amount, r.w) for r in TL.log_read(spark, root).collect()}
    assert got[2] == (22, 7) and got[1] == (111, None)


def test_merge_sql_with_schema_evolution(spark, table):
    """MERGE WITH SCHEMA EVOLUTION INTO: new source columns extend the
    target through SET * / INSERT *; untouched rows read typed NULL.
    Without the keyword extra source columns are IGNORED."""
    spark.createDataFrame(
        [(1, 111, "B", 9.5), (100, 5, "N", 1.5)],
        "k LONG, val LONG, tag STRING, score DOUBLE",
    ).createOrReplaceTempView("merge_sql_evo")
    # without the keyword: extras ignored (the Delta default)
    TL.log_merge_sql(
        spark,
        f"""MERGE INTO `{table}` t USING merge_sql_evo s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert "score" not in TL.log_read(spark, table).columns
    TL.log_merge_sql(
        spark,
        f"""MERGE WITH SCHEMA EVOLUTION INTO `{table}` t
            USING merge_sql_evo s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    got = {r.k: r.score for r in TL.log_read(spark, table).collect()}
    assert got[1] == 9.5 and got[100] == 1.5
    assert got[3] is None and len(got) == 11


def test_merge_sql_schema_evolution_full_sync(spark, table):
    """The content-replace branch evolves too: BY SOURCE DELETE with a
    new source column — survivors take source images incl. the new
    column; the commit is one atomic replace."""
    spark.createDataFrame(
        [(1, 111, "B", 9.5), (2, 222, "B", 8.5)],
        "k LONG, val LONG, tag STRING, score DOUBLE",
    ).createOrReplaceTempView("merge_sql_evo2")
    TL.log_merge_sql(
        spark,
        f"""MERGE WITH SCHEMA EVOLUTION INTO `{table}` t
            USING merge_sql_evo2 s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    got = {r.k: (r.val, r.score)
           for r in TL.log_read(spark, table).collect()}
    assert got == {1: (111, 9.5), 2: (222, 8.5)}


def test_update_delete_statement_aliases(spark, root):
    """UPDATE `root` AS t SET t.col ... / DELETE FROM `root` t WHERE
    t.col ... (Delta's table-alias forms): the alias is notation only —
    stripped outside string literals at word boundaries."""
    df = spark.createDataFrame(
        [(k, k * 10, "A") for k in range(8)], "k LONG, val LONG, tag STRING"
    )
    TL.log_append(spark, root, df)
    TL.log_sql(
        spark,
        f"UPDATE `{root}` AS t SET t.val = t.val + 1, tag = 't.x' "
        "WHERE t.k % 2 = 0",
    )
    got = _state(spark, root)
    assert got[0] == (1, "t.x")      # literal 't.x' untouched by strip
    assert got[1] == (10, "A")
    TL.log_sql(spark, f"DELETE FROM `{root}` t WHERE t.k >= 6")
    assert set(_state(spark, root)) == set(range(6))


def test_set_star_preserves_target_only_columns(spark, root):
    """Delta's star semantics assign BY NAME from the SOURCE columns:
    UPDATE SET * preserves a target-only column, INSERT * NULLs it
    (r13 — `s.col` for a column the source lacks was an analysis
    error before)."""
    TL.log_append(
        spark,
        root,
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "k LONG, val LONG, w STRING"
        ),
    )
    spark.createDataFrame(
        [(1, 111), (5, 5)], "k LONG, val LONG"
    ).createOrReplaceTempView("merge_sql_starsrc")
    TL.log_merge_sql(
        spark,
        f"MERGE INTO `{root}` t USING merge_sql_starsrc s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.k: (r.val, r.w) for r in TL.log_read(spark, root).collect()}
    assert got == {1: (111, "a"), 2: (20, "b"), 5: (5, None)}
    # the replace branch (BY SOURCE) preserves target-only columns too
    TL.log_merge_sql(
        spark,
        f"MERGE INTO `{root}` t USING merge_sql_starsrc s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    got = {r.k: (r.val, r.w) for r in TL.log_read(spark, root).collect()}
    assert got == {1: (111, "a"), 5: (5, None)}
