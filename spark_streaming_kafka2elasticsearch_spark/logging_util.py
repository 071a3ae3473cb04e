"""Structured (ECS-style) JSON logging — reference I4 parity.

The reference logs a JSON-ish record at every stage boundary
(reference ``bexley_spark_stream_msk_es.py:34-39`` sets up
``ecs_logging.StdlibFormatter``; per-stage info/error calls at
``:216,220,244,265,332,408,429,450,531``).  We provide the same
shape without the ecs-logging dependency: a stdlib formatter emitting
one JSON object per line with the ECS core fields.
"""

from __future__ import annotations

import json
import logging
import time


class EcsJsonFormatter(logging.Formatter):
    """Minimal ECS-shaped JSON lines: @timestamp, log.level, message,
    log.logger, plus any ``extra={"event": ...}`` payload."""

    def format(self, record: logging.LogRecord) -> str:
        doc = {
            "@timestamp": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(record.created)
            )
            + f".{int(record.msecs):03d}Z",
            "log.level": record.levelname.lower(),
            "message": record.getMessage(),
            "log.logger": record.name,
        }
        event = getattr(record, "event", None)
        if event:
            doc["event"] = event
        if record.exc_info and record.exc_info[0] is not None:
            doc["error.type"] = record.exc_info[0].__name__
            doc["error.message"] = str(record.exc_info[1])
        return json.dumps(doc)


def configure_json_logging(
    name: str = "spark_streaming_kafka2elasticsearch_spark", level: int = logging.INFO
) -> logging.Logger:
    """Attach a stderr JSON handler to the engine logger (idempotent)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(
        isinstance(h.formatter, EcsJsonFormatter) for h in logger.handlers
    ):
        handler = logging.StreamHandler()
        handler.setFormatter(EcsJsonFormatter())
        logger.addHandler(handler)
    return logger
