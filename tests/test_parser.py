"""Contract parsing: YAML/TOML, autodetect, definition validation.

Mirrors contracts_parser tests + the reference's own example contract
(examples/contracts/user_events.yml parses unchanged).
"""

import pytest

from dce_spark.contract import ContractError
from dce_spark.parser import parse_file, parse_str, parse_toml, parse_yaml

MINIMAL_YAML = """
version: "1.0.0"
name: t
owner: me
schema:
  fields:
    - name: a
      type: int64
"""

MINIMAL_TOML = """
version = "1.0.0"
name = "t"
owner = "me"

[schema]
[[schema.fields]]
name = "a"
type = "int64"
"""

REFERENCE_STYLE_YAML = """
version: "1.0.0"
name: user_events
owner: analytics-team
description: User interaction events

schema:
  format: parquet
  location: /tmp/x.parquet
  fields:
    - name: event_id
      type: string
      nullable: false
      tags: [primary_key, pii]
    - name: event_type
      type: string
      nullable: false
      constraints:
        - type: allowedvalues
          values: [page_view, purchase]
    - name: page_url
      type: string
      nullable: true
      constraints:
        - type: pattern
          regex: "^https?://.*"
    - name: amount
      type: float64
      constraints:
        - type: range
          min: 0
          max: 10000
    - name: event_properties
      type: map<string,string>
      nullable: true

quality_checks:
  completeness:
    threshold: 0.99
    fields: [event_id, event_type]
  uniqueness:
    fields: [event_id]
    scope: global
  freshness:
    max_delay: 1h
    metric: event_id
  custom_checks:
    - name: c1
      definition: "SELECT COUNT(*) FROM data WHERE amount < 0"
      severity: error
  ml_checks:
    class_balance:
      label_field: event_type
      max_proportion: 0.9
    feature_drift:
      split_field: event_type
      reference_split: page_view
      current_split: purchase
      feature_fields: [amount]

sla:
  availability: 0.999
  response_time: 100ms
"""


def test_yaml_minimal():
    c = parse_yaml(MINIMAL_YAML)
    assert c.name == "t" and len(c.schema.fields) == 1


def test_toml_minimal():
    c = parse_toml(MINIMAL_TOML)
    assert c.name == "t" and c.schema.fields[0].type == "int64"


def test_autodetect():
    assert parse_str(MINIMAL_YAML).name == "t"
    assert parse_str(MINIMAL_TOML).name == "t"


def test_reference_style_contract():
    c = parse_yaml(REFERENCE_STYLE_YAML)
    assert c.quality_checks.uniqueness.scope == "global"
    assert c.quality_checks.ml_checks.class_balance.max_proportion == 0.9
    assert c.quality_checks.ml_checks.feature_drift.num_bins == 10  # default
    assert len(c.schema.fields[1].constraints) == 1
    assert c.sla.availability == 0.999


def test_parse_file(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(MINIMAL_YAML)
    assert parse_file(p).name == "t"
    p2 = tmp_path / "c.toml"
    p2.write_text(MINIMAL_TOML)
    assert parse_file(p2).name == "t"


@pytest.mark.parametrize(
    "mutation,msg",
    [
        (lambda d: d.pop("version"), "version"),
        (lambda d: d.pop("schema"), "schema"),
        (lambda d: d["schema"].update(fields=[]), "at least one field"),
    ],
)
def test_definition_errors(mutation, msg):
    import yaml as _yaml

    d = _yaml.safe_load(MINIMAL_YAML)
    mutation(d)
    from dce_spark.parser import contract_from_dict

    with pytest.raises(ContractError):
        contract_from_dict(d)


def test_bad_field_reference():
    bad = MINIMAL_YAML + """
quality_checks:
  completeness:
    threshold: 0.9
    fields: [nonexistent]
"""
    with pytest.raises(ContractError, match="undeclared field"):
        parse_yaml(bad)


def test_bad_type_string():
    with pytest.raises(ContractError, match="invalid type"):
        parse_yaml(MINIMAL_YAML.replace("int64", "wibble"))


def test_duplicate_fields():
    dup = """
version: "1"
name: t
owner: me
schema:
  fields:
    - {name: a, type: int64}
    - {name: a, type: string}
"""
    with pytest.raises(ContractError, match="duplicate"):
        parse_yaml(dup)
