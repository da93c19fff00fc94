from liblognorm_spark.compiler.compiler import CompiledRulebase, compile_rulebase

__all__ = ["CompiledRulebase", "compile_rulebase"]
