"""Engine error types, mirroring the reference's error conditions.

Each class documents the reference behavior it reproduces (file:line into
/root/reference)."""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class CollectionExistsError(EngineError):
    """Duplicate collection id on create (database/database.go:100-103)."""


class CollectionNotFoundError(EngineError):
    """Missing collection on get/delete/query (database/database.go:118-124,126-137)."""


class RecordExistsError(EngineError):
    """Duplicate record id on insert (collection/collection.go:33-36)."""


class RecordNotFoundError(EngineError):
    """Missing record on get/delete (collection/collection.go:47-54,56-62)."""


class EmbedderMismatchError(EngineError):
    """record.embedder_id != collection.embedder_id (collection/collection.go:37-39)."""


class NullEmbeddingError(EngineError):
    """Insert of a record with a null embedding (collection/collection.go:40-42)."""


class InvalidEmbedderError(EngineError):
    """Unresolvable embedder name (embedders/embedders.go:93-94)."""


class EmbeddingDimensionError(EngineError):
    """Vector length mismatch in the cosine kernel (utils/utils.go:11-13)."""
