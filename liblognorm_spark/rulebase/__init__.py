from liblognorm_spark.rulebase.loader import Rulebase, RulebaseError

__all__ = ["Rulebase", "RulebaseError"]
