"""Distributed dense linear algebra (the reference's core capability).

DataFrame-native block matrices + recursive block LU with partial
pivoting + triangular solve/inverse + full inverse.
Reference: /root/reference/Matrix/{LUDecomposition,LUInverse}.java.
"""
