from genie_spark.rules.engine import (
    FrameRule,
    RowRule,
    RuleSet,
    ValidationReport,
)

__all__ = ["FrameRule", "RowRule", "RuleSet", "ValidationReport"]
