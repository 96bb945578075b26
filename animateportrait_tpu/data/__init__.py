"""Datasets: umlvd_ifw (drawing) / umlvd_ifw_cartoon training pipelines."""
