from . import expm, inner_products, isomorphism, propagation, taylor
