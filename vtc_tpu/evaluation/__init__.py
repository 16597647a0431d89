from .retrieval_eval import compute_recall, retrieval_evaluation  # noqa: F401
