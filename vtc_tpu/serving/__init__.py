from .index import ClipRetrievalService, RetrievalIndex  # noqa: F401
