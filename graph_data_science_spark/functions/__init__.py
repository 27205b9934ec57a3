"""Scalar / pair-level function surface (``gds.similarity.*``,
``gds.alpha.linkprediction.*``) — the reference's @UserFunction layer."""

from graph_data_science_spark.functions.link_prediction import (  # noqa: F401
    link_prediction_scores,
)
from graph_data_science_spark.functions.similarity import (  # noqa: F401
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)
from graph_data_science_spark.functions.encoding import (  # noqa: F401
    one_hot_encoding,
)
