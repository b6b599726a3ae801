"""SAP transform consistency: structured O(nnz) paths vs elementwise oracle,
and the SAP constraint identity (Uz)^2 = Wz on satisfied R1CS instances."""

import random

from polymath_tpu.frontend.r1cs import ConstraintSystem, lc, synthesize
from polymath_tpu.frontend.sap import SAPMatrices, sparse_matvec
from polymath_tpu.protocol.poly_host import Radix2Domain
from polymath_tpu.circuits import DummyCircuit
from polymath_tpu.hostmath.bls12_381 import R

rng = random.Random(99)


def _random_r1cs(m0_extra=2, n_w=3, n_c=4):
    """Build a random satisfiable R1CS: c_i = a_i * b_i over random LCs."""
    cs = ConstraintSystem(ConstraintSystem.SETUP)
    cs_p = ConstraintSystem(ConstraintSystem.PROVE)
    vals = {}
    for i in range(m0_extra):
        v = rng.randrange(R)
        cs.new_input_variable()
        cs_p.new_input_variable(v)
    for i in range(n_w):
        v = rng.randrange(R)
        cs.new_witness_variable()
        cs_p.new_witness_variable(v)
    full = cs_p.full_assignment()

    def rand_lc():
        terms = []
        val = 0
        for _ in range(rng.randrange(1, 4)):
            col = rng.randrange(len(full))
            coeff = rng.randrange(R)
            terms.append((coeff, col))
            val = (val + coeff * full[col]) % R
        return terms, val

    from polymath_tpu.frontend.r1cs import Variable, ONE

    def col_var(cs_obj, col):
        if col == 0:
            return ONE
        if col < cs_obj.num_instance_variables:
            return Variable(Variable.INSTANCE, col)
        return Variable(Variable.WITNESS, col - cs_obj.num_instance_variables)

    for _ in range(n_c):
        a_terms, a_val = rand_lc()
        b_terms, b_val = rand_lc()
        prod = a_val * b_val % R
        wa = cs.new_witness_variable()
        wb = cs_p.new_witness_variable(prod)
        full.append(prod)
        for c in (cs, cs_p):
            a_lc = lc(*[(co, col_var(c, col)) for co, col in a_terms])
            b_lc = lc(*[(co, col_var(c, col)) for co, col in b_terms])
            c.enforce_constraint(a_lc, b_lc, lc(wa))
    cs.finalize()
    cs_p.finalize()
    return cs, cs_p


def test_sap_structured_vs_elementwise():
    cs, cs_p = _random_r1cs()
    sap = SAPMatrices.from_constraint_system(cs)
    rows, cols = sap.size()
    domain = Radix2Domain(rows)
    z = sap.z_vector(cs_p.instance_assignment, cs_p.witness_assignment)
    assert len(z) == cols

    u_fast = sap.u_evals(z, domain.n)
    w_fast = sap.w_evals(z, domain.n)
    for i in range(domain.n):
        u_slow = sum(sap.u(i, j) * z[j] for j in range(cols)) % R if i < rows else 0
        w_slow = sum(sap.w(i, j) * z[j] for j in range(cols)) % R if i < rows else 0
        assert u_fast[i] == u_slow, f"u row {i}"
        assert w_fast[i] == w_slow, f"w row {i}"


def test_sap_identity_on_satisfied_r1cs():
    """(Uz)_i^2 == (Wz)_i for all rows when the R1CS is satisfied."""
    cs, cs_p = _random_r1cs()
    sap = SAPMatrices.from_constraint_system(cs)
    rows, _ = sap.size()
    domain = Radix2Domain(rows)
    z = sap.z_vector(cs_p.instance_assignment, cs_p.witness_assignment)
    u = sap.u_evals(z, domain.n)
    w = sap.w_evals(z, domain.n)
    for i in range(domain.n):
        assert u[i] * u[i] % R == w[i], f"SAP identity fails at row {i}"


def test_transposed_columns_vs_elementwise():
    cs, _ = _random_r1cs()
    sap = SAPMatrices.from_constraint_system(cs)
    rows, cols = sap.size()
    m0 = sap.num_instance_variables
    u_cols = sap.u_columns_transposed()
    w_cols = sap.w_columns_transposed()
    for j in range(m0, cols):
        uc = {}
        for i, coeff in u_cols.get(j, ()):
            uc[i] = (uc.get(i, 0) + coeff) % R
        wc = {}
        for i, coeff in w_cols.get(j, ()):
            wc[i] = (wc.get(i, 0) + coeff) % R
        for i in range(rows):
            assert uc.get(i, 0) == sap.u(i, j), f"u col {j} row {i}"
            assert wc.get(i, 0) == sap.w(i, j), f"w col {j} row {i}"


def test_witness_evals_match_column_split():
    cs, cs_p = _random_r1cs()
    sap = SAPMatrices.from_constraint_system(cs)
    rows, cols = sap.size()
    m0 = sap.num_instance_variables
    domain = Radix2Domain(rows)
    z = sap.z_vector(cs_p.instance_assignment, cs_p.witness_assignment)
    wu = sap.witness_u_evals(z, domain.n)
    ww = sap.witness_w_evals(z, domain.n)
    for i in range(rows):
        exp_u = sum(sap.u(i, j) * z[j] for j in range(m0, cols)) % R
        exp_w = sum(sap.w(i, j) * z[j] for j in range(m0, cols)) % R
        assert wu[i] == exp_u
        assert ww[i] == exp_w


def test_dummy_circuit_dimensions():
    cs = synthesize(DummyCircuit(), ConstraintSystem.SETUP)
    sap = SAPMatrices.from_constraint_system(cs)
    assert sap.m0_m_n() == (2, 4, 1)  # m0=2 (1 + c), m=4 vars, 1 constraint
    assert sap.size() == (6, 9)
