"""Sum-of-squares lower bound for a bivariate polynomial
(reference: examples/sos.jl via SumOfSquares.jl/DynamicPolynomials).

    max t   s.t.   p(x, z) - t  is SOS,
    p = x^4 + x^2 - 3 x^2 z^2 + z^6

The SOS certificate is the SDP: p - t = m(x,z)' Q m(x,z) with Q PSD
over the Newton-polytope-reduced monomial basis
m = [1, x, z, x^2, xz, z^2, z^3].  Coefficient matching per monomial
gives the equality rows; the reference solves the same SDP produced by
SumOfSquares.jl and reports the bound t* ~= -0.17700 (sos.jl:23).
"""

from collections import defaultdict
from itertools import product

import numpy as np  # noqa: F401

import proxsdp_tpu as px

# monomial basis as (deg_x, deg_z) pairs (Newton polytope of p halved)
BASIS = [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2), (0, 3)]
# p's coefficients by monomial
P_COEFFS = {(4, 0): 1.0, (2, 0): 1.0, (2, 2): -3.0, (0, 6): 1.0}


def build_and_solve(verbose: bool = False, **options):
    d = len(BASIS)
    opt = px.Optimizer(log_verbose=verbose, **options)
    Q = opt.add_psd_var(d)
    (t,) = (int(v) for v in opt.add_free_vars(1))

    # group Q entries by the monomial their basis product contributes to
    by_monomial = defaultdict(dict)
    for i, j in product(range(d), repeat=2):
        if j < i:
            continue
        mono = (BASIS[i][0] + BASIS[j][0], BASIS[i][1] + BASIS[j][1])
        coeff = 1.0 if i == j else 2.0  # Q is symmetric: (i,j) and (j,i)
        idx = int(Q[i, j])
        by_monomial[mono][idx] = by_monomial[mono].get(idx, 0.0) + coeff

    # coefficient matching: <selector, Q> = coeff(p)  per monomial, with
    # the constant row carrying the -t
    for mono, terms in sorted(by_monomial.items()):
        target = P_COEFFS.get(mono, 0.0)
        coeffs = dict(terms)
        if mono == (0, 0):
            coeffs[t] = 1.0  # Q_const + t = 0  ->  constant coeff = -t...
        opt.add_eq_constraint(coeffs, target)

    opt.set_objective({t: 1.0}, sense="max")
    res = opt.optimize()
    return res, res.primal[t]


if __name__ == "__main__":
    res, t_star = build_and_solve(verbose=True)
    print(f"status : {res.status_string}")
    print(f"bound  : t* = {t_star:.5f}   (reference sos.jl: -0.17700)")
