"""Independent NumPy re-derivations of the fluctuation-calculus kernels.

Written directly from the semigrand/grand-canonical fluctuation formulas
(reference math at ntot/gc_hist.pyx:1660-1993), with no JAX involved, to
cross-check the DerivEngine.  Deliberately plain, index-by-index numpy.
"""

import numpy as np


def _fold_order(idx):
    i, j, k, m, p = idx
    if i == k:
        j, m, k = j + m, 0, 0
    if i > k:
        i, j, k, m = k, m, i, j
    return (i, j, k, m, p)


def mom_prod_np(x_idx, y_idx, max_order):
    x = _fold_order(tuple(x_idx))
    y = _fold_order(tuple(y_idx))
    if x[0] == y[0] and x[2] == y[2]:
        z = (x[0], x[1] + y[1], x[2], x[3] + y[3], x[4] + y[4])
    elif x[0] == 0 and x[2] == 0 and y[0] == 0 and y[2] == 1:
        z = (y[0], y[1] + x[1] + x[3], y[2], y[3], y[4] + x[4])
    elif x[0] == 0 and x[2] == 1 and y[0] == 0 and y[2] == 0:
        z = (x[0], x[1] + y[1] + y[3], x[2], x[3], x[4] + y[4])
    else:
        raise ValueError("bad product")
    i, j, k, m, p = z
    if i == k:
        if j > max_order:
            j, m = max_order, j - max_order
        elif m > max_order:
            m, j = max_order, m - max_order
    assert j <= max_order and m <= max_order and p <= max_order
    return (i, j, k, m, p)


class NpKernels:
    def __init__(self, lnpi, mom, ntot, mu, beta, used_ke, max_order, nspec=2):
        self.lnpi = np.asarray(lnpi, float)
        self.mom = np.asarray(mom, float)
        self.ntot = np.asarray(ntot, float)
        self.mu = np.asarray(mu, float)
        self.beta = float(beta)
        self.ke = used_ke
        self.mo = max_order
        self.ns = nspec

    def m(self, a):
        return self.mom[a[0], a[1], a[2], a[3], a[4]]

    def X(self, a, n=0):
        return self.m(a) * self.ntot**n if n else self.m(a)

    def sg_dX_dB(self, a, n=0):
        a = tuple(a)
        if a[1] == 0 and a[3] == 0 and a[4] == 0:
            return np.zeros_like(self.lnpi)
        assert a[1] < self.mo and a[3] < self.mo and a[4] < self.mo
        opn = self.ntot**n
        U = (0, 0, 0, 0, 1)
        f_XU = self.m((a[0], a[1], a[2], a[3], a[4] + 1)) * opn - self.m(a) * opn * self.m(U)
        der = -f_XU
        for i in range(self.ns):
            if a[0] == i and a[1] + 1 <= self.mo:
                XNi = self.m((a[0], a[1] + 1, a[2], a[3], a[4])) * opn
            elif a[2] == i and a[3] + 1 <= self.mo:
                XNi = self.m((a[0], a[1], a[2], a[3] + 1, a[4])) * opn
            elif a[1] == 0:
                XNi = self.m((i, 1, a[2], a[3], a[4])) * opn
            elif a[3] == 0:
                XNi = self.m((a[0], a[1], i, 1, a[4])) * opn
            elif a[0] == a[2] and a[1] + a[3] <= self.mo:
                XNi = self.m((a[0], a[1] + a[3], i, 1, a[4])) * opn
            else:
                raise ValueError("max_order too low")
            f_XNi = XNi - self.m(a) * opn * self.m((i, 1, 0, 0, 0))
            der = der + (self.mu[i] - self.mu[0]) * f_XNi
        if self.ke and a[4] > 0:
            RU = self.m((a[0], a[1], a[2], a[3], a[4] - 1)) * opn
            der = der - 1.5 * a[4] / self.beta**2 * self.ntot * RU
        return der

    def sg_df_dB(self, xt, yt):
        (x, nx), (y, ny) = xt, yt
        z = mom_prod_np(x, y, self.mo)
        return (
            self.sg_dX_dB(z, nx + ny)
            - self.X(tuple(x), nx) * self.sg_dX_dB(tuple(y), ny)
            - self.X(tuple(y), ny) * self.sg_dX_dB(tuple(x), nx)
        )

    def sg_d2X_dB2(self, a, n=0):
        a = tuple(a)
        if a[1] == 0 and a[3] == 0 and a[4] == 0:
            return np.zeros_like(self.lnpi)
        assert a[1] < self.mo and a[3] < self.mo and a[4] < self.mo
        U = (0, 0, 0, 0, 1)
        der = -self.sg_df_dB((a, n), (U, 0))
        for i in range(self.ns):
            der = der + (self.mu[i] - self.mu[0]) * self.sg_df_dB((a, n), ((i, 1, 0, 0, 0), 0))
        if self.ke and a[4] > 0:
            y = (a[0], a[1], a[2], a[3], a[4] - 1)
            RU = self.m(y) * self.ntot**n
            der = der + (-1.5) * a[4] * self.ntot / self.beta**2 * (-2.0 / self.beta * RU + self.sg_dX_dB(y, n))
        return der

    def sg_dX_dMU(self, q, a):
        a = tuple(a)
        if a[1] == 0 and a[3] == 0 and a[4] == 0:
            return np.zeros_like(self.lnpi)
        assert a[1] < self.mo and a[3] < self.mo and a[4] < self.mo
        i = q + 1
        if a[0] == i and a[1] + 1 <= self.mo:
            XNi = self.m((a[0], a[1] + 1, a[2], a[3], a[4]))
        elif a[2] == i and a[3] + 1 <= self.mo:
            XNi = self.m((a[0], a[1], a[2], a[3] + 1, a[4]))
        elif a[1] == 0:
            XNi = self.m((i, 1, a[2], a[3], a[4]))
        elif a[3] == 0:
            XNi = self.m((a[0], a[1], i, 1, a[4]))
        elif a[0] == a[2] and a[1] + a[3] <= self.mo:
            XNi = self.m((a[0], a[1] + a[3], i, 1, a[4]))
        else:
            raise ValueError("max_order too low")
        return self.beta * (XNi - self.m(a) * self.m((i, 1, 0, 0, 0)))

    def sg_d2X_dMU2(self, q, r, a):
        a = tuple(a)
        if a[1] == 0 and a[3] == 0 and a[4] == 0:
            return np.zeros_like(self.lnpi)
        y = (r + 1, 1, 0, 0, 0)
        z = mom_prod_np(a, y, self.mo)
        return self.beta * (
            self.sg_dX_dMU(q, z) - self.m(a) * self.sg_dX_dMU(q, y) - self.m(y) * self.sg_dX_dMU(q, a)
        )

    # grand-canonical
    def ave(self, v):
        p = np.exp(self.lnpi)
        return np.sum(v * p) / np.sum(p)

    def gc_dX_dB(self, a, n=0):
        X = self.X(tuple(a), n)
        U = (0, 0, 0, 0, 1)
        fl = lambda u, v: self.ave(u * v) - self.ave(u) * self.ave(v)  # noqa: E731
        der = self.mu[0] * fl(X, self.ntot) - fl(X, self.m(U))
        for i in range(self.ns):
            der += (self.mu[i] - self.mu[0]) * fl(X, self.m((i, 1, 0, 0, 0)))
        if self.ke and a[4] > 0:
            RUN = self.m((a[0], a[1], a[2], a[3], a[4] - 1)) * self.ntot ** (n + 1)
            der -= 1.5 * a[4] / self.beta**2 * self.ave(RUN)
        return der
