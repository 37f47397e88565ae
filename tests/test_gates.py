"""Gate constructors, qudit utilities, kron builders, dressed helpers."""

import numpy as np
import pytest

from qoc_tpu.models import gates, operators
from qoc_tpu.models.dressed import (
    dressed_unitary, get_dressed_info, get_state_index, sort_ev,
)


def test_qft_unitary():
    for N in (1, 2, 3):
        Q = gates.qft(N)
        assert np.allclose(Q @ Q.conj().T, np.eye(2**N), atol=1e-12)


def test_qft_values():
    Q = gates.qft(1)
    assert np.allclose(Q, np.array([[1, 1], [1, -1]]) / np.sqrt(2))


def test_hadamard():
    H1 = gates.hadamard(1)
    assert np.allclose(H1, np.array([[1, 1], [1, -1]]) / np.sqrt(2))
    H2 = gates.hadamard(2)
    assert np.allclose(H2 @ H2, np.eye(4), atol=1e-12)


def test_rz_rx():
    assert np.allclose(np.asarray(gates.rz(np.pi)) @ np.asarray(gates.rz(-np.pi)),
                       np.eye(2), atol=1e-12)
    # rx(pi) = -i sigma_x
    assert np.allclose(np.asarray(gates.rx(np.pi)), -1j * operators.SIGMA_X,
                       atol=1e-12)


def test_basis_utilities():
    assert gates.base_n(0, 3) == "0"
    assert gates.base_n(5, 3) == "12"
    assert gates.basis_string(5, 3, 3) == "012"
    assert gates.bin_string(5, 4) == "0101"
    assert gates.is_binary("0101")
    assert not gates.is_binary("012")
    assert gates.hamming_distance(7) == 3


def test_concerned():
    # 1 qutrit: binary states are 0,1
    assert gates.concerned(1, 3) == [0, 1]
    # 2 qutrits: 00,01,10,11 -> indices 0,1,3,4
    assert gates.concerned(2, 3) == [0, 1, 3, 4]


def test_transmon_gate_embedding():
    X = operators.SIGMA_X
    G = gates.transmon_gate(X, 3)
    assert G.shape == (3, 3)
    assert np.allclose(G[:2, :2], X)
    assert G[2, 2] == 1.0
    # 2-qubit gate into qutrits
    CNOT = np.eye(4)[:, [0, 1, 3, 2]]
    G2 = gates.transmon_gate(CNOT, 3)
    assert G2.shape == (9, 9)
    comp = gates.concerned(2, 3)
    assert np.allclose(G2[np.ix_(comp, comp)], CNOT)


def test_multi_kron():
    X = operators.SIGMA_X
    assert np.allclose(operators.multi_kron(X, 2), np.kron(X, X))


def test_kron_all_intended_semantics():
    X, I = operators.SIGMA_X, np.eye(2)
    out = operators.kron_all(X, 2, I)
    want = np.kron(X, I) + np.kron(I, X)
    assert np.allclose(out, want)


def test_nn_chain_kron():
    X, I = operators.SIGMA_X, np.eye(2)
    out = operators.nn_chain_kron(X, I, 3, 2)
    want = np.kron(np.kron(X, X), I) + np.kron(np.kron(I, X), X)
    assert np.allclose(out, want)


def test_append_separate_krons():
    X, I = operators.SIGMA_X, np.eye(2)
    Hops, Hnames, amps = operators.append_separate_krons(
        X, "x", 3, 2, [], [], [], amp=2.0
    )
    assert len(Hops) == 3 and len(Hnames) == 3 and len(amps) == 3
    assert Hnames == ["xii", "ixi", "iix"]
    assert np.allclose(Hops[0], np.kron(np.kron(X, I), I))
    assert np.allclose(Hops[1], np.kron(np.kron(I, X), I))
    assert np.allclose(Hops[2], np.kron(np.kron(I, I), X))


def test_ladder_ops():
    a = operators.annihilate(4)
    n = operators.number(4)
    assert np.allclose(a.conj().T @ a, n, atol=1e-12)


def test_dressed_info_roundtrip(rng):
    # weakly-coupled system: dressed ids should be a permutation
    H0 = np.diag([0.0, 1.0, 2.1, 3.3]) + 0.05 * rng.standard_normal((4, 4))
    H0 = (H0 + H0.T) / 2
    w, v, dressed_id = get_dressed_info(H0)
    assert sorted(dressed_id) == [0, 1, 2, 3]
    # sort_ev columns should be the eigenvector assigned to each bare state
    vs = sort_ev(v, dressed_id)
    for bare in range(4):
        assert np.allclose(vs[:, bare], v[:, get_state_index(bare, dressed_id)])


def test_dressed_unitary_identity():
    H0 = np.diag([0.0, 1.0, 2.0])
    w, v, dressed_id = get_dressed_info(H0)
    U = gates.qft(1)
    U3 = np.eye(3, dtype=complex)
    U3[:2, :2] = U
    out = dressed_unitary(U3, v, dressed_id)
    assert out.shape == (3, 3)
    # for a diagonal H0 the dressed rotation is (up to column signs) identity
    assert np.allclose(np.abs(out), np.abs(U3), atol=1e-12)
