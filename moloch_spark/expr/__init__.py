from moloch_spark.expr.compiler import CompileContext, compile_expression
from moloch_spark.expr.parser import parse

__all__ = ["CompileContext", "compile_expression", "parse"]
