"""Operators: the algorithm suite (the reference's procedure surface).

Core four (SURVEY §2.4): :mod:`pagerank` (+ ArticleRank, Eigenvector),
:mod:`wcc`, :mod:`label_propagation`, :mod:`triangle`.
Aux: :mod:`degree`, :mod:`scale_properties`, :mod:`similarity`,
:mod:`paths`, :mod:`sampling`.
"""
