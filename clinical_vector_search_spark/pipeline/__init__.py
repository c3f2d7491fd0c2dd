"""End-to-end pipelines reproducing the reference's modes
(baseline / DP / FHE / RAG-hybrid)."""
