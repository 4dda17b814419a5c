"""Model families: the GP relevance model and the active-retrieval session."""
