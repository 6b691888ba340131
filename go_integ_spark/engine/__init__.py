from go_integ_spark.engine.lifecycle import Engine, ReadResult
from go_integ_spark.engine.envelope import RunInput, parse_envelope

__all__ = ["Engine", "ReadResult", "RunInput", "parse_envelope"]
