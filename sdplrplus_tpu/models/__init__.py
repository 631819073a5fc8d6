from .problems import (
    maxcut,
    lovasz_theta,
    minimum_bisection,
    cutnorm,
    mu_conductance,
    mu_conductance_ineq,
    mu_conductance_reformulated,
    mu_conductance_native,
    relaxed_maxcut,
    relaxed_maxcut_ineq,
    make_random_graph,
    bipartite_matrix,
)
