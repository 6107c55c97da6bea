"""Engine error taxonomy.

Mirrors the reference's error enum (reference src/error.rs:7-14:
``DataFusionError | YamlError | IoError | ReqwestError``) with
Python-native names: QueryError, ConfigError, IoError, HttpError —
all subclasses of EngineError so callers can catch one base type.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class QueryError(EngineError):
    """Query planning/execution failure (reference: DataFusionError)."""


class ConfigError(EngineError):
    """Config parse/validation failure (reference: YamlError)."""


class IoError(EngineError):
    """Filesystem failure (reference: IoError)."""


class HttpError(EngineError):
    """HTTP fetch failure: bad method, non-2xx status, or invalid JSON
    (reference: ReqwestError, src/datasources.rs:217-223, 265-267)."""
