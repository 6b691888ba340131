from go_integ_spark.protocols.base import ProtocolWriter, StreamWriter
from go_integ_spark.protocols.airbyte import AirbyteWriter
from go_integ_spark.protocols.singer import SingerWriter

PROTOCOLS = {
    "airbyte": AirbyteWriter,
    "": AirbyteWriter,  # reference default: empty format -> Airbyte (proto.go:103-107)
    "singer": SingerWriter,
}

__all__ = ["ProtocolWriter", "StreamWriter", "AirbyteWriter", "SingerWriter", "PROTOCOLS"]
