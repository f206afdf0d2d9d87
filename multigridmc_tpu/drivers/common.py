"""Shared driver setup: config -> lattice, correlation model, prior/posterior
operators (cf. ``src/driver_mgmc.cc:336-447`` and ``src/driver_mg.cc:51-151``)."""

from __future__ import annotations

import sys


from ..lattice import Lattice
from ..models.correlation import (
    ConstantCorrelationLengthModel,
    PeriodicCorrelationLengthModel,
)
from ..models.posterior import MeasurementParameters, measured_operator
from ..models.prior import prior_operator
from ..utils.config import Config


def build_lattice(config: Config) -> Lattice:
    lp = config.lattice
    dim = config.general.dim
    if dim == 2:
        return Lattice((lp.nx, lp.ny))
    if dim == 3:
        return Lattice((lp.nx, lp.ny, lp.nz))
    print(f"ERROR: invalid dimension {dim}")
    sys.exit(-1)


def build_correlation_model(config: Config):
    name = config.prior.correlationlengthmodel
    if name == "constant":
        return ConstantCorrelationLengthModel(config.constant_correlationlength.Lambda)
    if name == "periodic":
        return PeriodicCorrelationLengthModel(
            config.periodic_correlationlength.Lambda_min,
            config.periodic_correlationlength.Lambda_max,
        )
    print(f"ERROR: invalid correlation length model '{name}'")
    sys.exit(-1)


def measurement_params(config: Config) -> MeasurementParameters:
    m = config.measurements
    return MeasurementParameters(
        measurement_locations=m.measurement_locations,
        mean=m.mean,
        variance=m.variance,
        radius=m.radius,
        variance_scaling=m.variance_scaling,
        sample_location=m.sample_location,
        measure_global=m.measure_global,
        mean_global=m.mean_global,
        variance_global=m.variance_global,
    )


def build_operators(config: Config):
    """Returns ``(prior, posterior_or_prior, measurement_params)`` following the
    driver's operator selection (``driver_mgmc.cc:413-447``)."""
    lattice = build_lattice(config)
    model = build_correlation_model(config)
    prior = prior_operator(config.prior.pdemodel, lattice, model)
    mparams = measurement_params(config)
    if config.general.operator == "posterior":
        op = measured_operator(prior, mparams)
    elif config.general.operator == "prior":
        op = prior
    else:
        print(f"ERROR: invalid operator '{config.general.operator}'")
        sys.exit(-1)
    return prior, op, mparams
