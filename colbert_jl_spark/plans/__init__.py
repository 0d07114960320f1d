from colbert_jl_spark.plans.build import IndexBuilder, IndexReader

__all__ = ["IndexBuilder", "IndexReader"]
