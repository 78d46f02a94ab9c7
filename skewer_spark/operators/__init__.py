from skewer_spark.operators.parse import parse_transcripts, parse_batch  # noqa: F401
from skewer_spark.operators.enrich import enrich, with_turn_rank, with_uid  # noqa: F401
from skewer_spark.operators.route import route, sink_frames  # noqa: F401
