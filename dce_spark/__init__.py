"""dce_spark — a PySpark-native data-contracts & data-quality engine.

A from-scratch rebuild of the capabilities of AndreaBozzo/dce (a
Rust/DataFusion data-contracts validation engine) as an idiomatic
Spark engine, plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the
reference does not have.

Design: contracts compile to DataFrame plans — one fused aggregation
scan for all row-local checks, one shuffled job per grouped check —
and Catalyst/Tungsten choose the physical execution. Zero Python UDFs
in the contract-parity path.
"""

from .api import (
    parse_contract_file,
    parse_contract_toml,
    parse_contract_yaml,
    profile_df,
    validate_batch,
    validate_batches,
    validate_contract,
    validate_df,
    validate_dfs,
    validate_ml_only,
    validate_partitions,
    validate_quality_only,
    validate_schema_only,
)
from .compiler import ValidationContext
from .contract import Contract
from .report import CheckResult, ValidationReport
from .types import format_data_type, parse_data_type

__version__ = "0.1.0"

__all__ = [
    "Contract",
    "CheckResult",
    "ValidationContext",
    "ValidationReport",
    "format_data_type",
    "parse_contract_file",
    "parse_contract_toml",
    "parse_contract_yaml",
    "parse_data_type",
    "profile_df",
    "validate_contract",
    "validate_batch",
    "validate_batches",
    "validate_df",
    "validate_dfs",
    "validate_ml_only",
    "validate_partitions",
    "validate_quality_only",
    "validate_schema_only",
]
