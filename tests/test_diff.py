"""Contract diffing: breaking/compatible classification of evolution."""

import pytest
from pyspark.sql import types as T

from dce_spark.diff import diff_contracts, is_widening
from dce_spark.parser import parse_yaml

OLD = parse_yaml(
    """
version: "1.0.0"
name: events
owner: data-eng
schema:
  fields:
    - name: id
      type: int32
      nullable: false
    - name: kind
      type: string
      constraints:
        - type: allowedvalues
          values: [a, b]
    - name: score
      type: float64
      constraints:
        - type: range
          min: 0
          max: 100
    - name: legacy
      type: string
"""
)


def _evolve(yaml_text):
    return parse_yaml(yaml_text)


def test_identical_contracts_no_changes():
    d = diff_contracts(OLD, OLD)
    assert d.changes == [] and not d.is_breaking


def test_widening_and_nullable_additions_are_compatible():
    new = _evolve(
        """
version: "1.1.0"
name: events
owner: data-eng
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: kind
      type: string
      constraints:
        - type: allowedvalues
          values: [a, b]
    - name: score
      type: float64
      constraints:
        - type: range
          min: 0
          max: 100
    - name: legacy
      type: string
    - name: note
      type: string
"""
    )
    d = diff_contracts(OLD, new)
    assert not d.is_breaking
    kinds = {c.kind for c in d.changes}
    assert kinds == {"type_widened", "field_added"}


def test_breaking_changes_classified_by_side():
    new = _evolve(
        """
version: "2.0.0"
name: events
owner: data-eng
schema:
  fields:
    - name: id
      type: string
      nullable: false
    - name: kind
      type: string
      nullable: false
      constraints:
        - type: allowedvalues
          values: [a, b, c]
    - name: score
      type: float64
      constraints:
        - type: range
          min: 10
          max: 100
    - name: mandatory
      type: int64
      nullable: false
"""
    )
    d = diff_contracts(OLD, new)
    by_kind = {c.kind: c for c in d.changes}
    assert by_kind["field_removed"].impact == "breaking-readers"  # legacy
    assert by_kind["type_changed"].impact == "breaking-readers"  # int32->string
    assert by_kind["allowed_values_loosened"].impact == "breaking-readers"
    assert by_kind["nullable_tightened"].impact == "breaking-writers"  # kind
    assert by_kind["range_narrowed"].impact == "breaking-writers"
    assert by_kind["required_field_added"].impact == "breaking-writers"
    assert d.is_breaking


def test_is_widening_lattice():
    assert is_widening(T.IntegerType(), T.LongType())
    assert is_widening(T.FloatType(), T.DoubleType())
    assert is_widening(T.IntegerType(), T.DoubleType())  # exact in 53-bit
    assert not is_widening(T.LongType(), T.DoubleType())  # lossy above 2^53
    assert not is_widening(T.LongType(), T.IntegerType())
    assert not is_widening(T.DoubleType(), T.FloatType())
    assert is_widening(
        T.ArrayType(T.IntegerType(), False), T.ArrayType(T.LongType(), True)
    )
    assert not is_widening(
        T.ArrayType(T.IntegerType(), True), T.ArrayType(T.LongType(), False)
    )
    old_s = T.StructType([T.StructField("a", T.IntegerType(), True)])
    wide_s = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    assert is_widening(old_s, wide_s)
    # added nested field that is NOT nullable -> not widening
    strict_s = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), False),
        ]
    )
    assert not is_widening(old_s, strict_s)
    assert is_widening(T.DecimalType(10, 2), T.DecimalType(12, 2))
    assert not is_widening(T.DecimalType(12, 2), T.DecimalType(10, 2))


def test_cli_diff_exit_codes(tmp_path, capsys):
    from dce_spark.cli import main

    old_p = tmp_path / "old.yml"
    new_p = tmp_path / "new.yml"
    old_p.write_text(
        "version: '1.0.0'\nname: t\nowner: o\nschema:\n  fields:\n"
        "    - name: a\n      type: int32\n"
    )
    # compatible: widening
    new_p.write_text(
        "version: '1.1.0'\nname: t\nowner: o\nschema:\n  fields:\n"
        "    - name: a\n      type: int64\n"
    )
    assert main(["diff", str(old_p), str(new_p)]) == 0
    # breaking: removal
    new_p.write_text(
        "version: '2.0.0'\nname: t\nowner: o\nschema:\n  fields:\n"
        "    - name: b\n      type: int32\n"
    )
    assert main(["diff", str(old_p), str(new_p), "--format", "json"]) == 2
    out = capsys.readouterr().out
    assert '"breaking": true' in out
    # parse error
    new_p.write_text("not: a contract")
    assert main(["diff", str(old_p), str(new_p)]) == 1
