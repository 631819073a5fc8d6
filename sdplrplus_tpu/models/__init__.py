from .problems import (
    maxcut,
    lovasz_theta,
    minimum_bisection,
    cutnorm,
    mu_conductance,
    mu_conductance_ineq,
    relaxed_maxcut,
    make_random_graph,
    bipartite_matrix,
)
