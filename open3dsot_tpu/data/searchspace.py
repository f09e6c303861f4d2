"""Offset-sampling search spaces (reference datasets/searchspace.py).

KalmanFiltering is the one used in training (sampler.py:53); the others are
kept for API completeness. The pomegranate-based GMM is provided as a
numpy/EM-free stub that degrades to the particle filter, since pomegranate is
not a dependency of this framework.
"""

from __future__ import annotations

import numpy as np


class SearchSpace:
    def reset(self):
        raise NotImplementedError

    def sample(self, n=10):
        raise NotImplementedError

    def addData(self, data, score):
        return


class ExhaustiveSearch(SearchSpace):
    def __init__(self, search_space=((-3.0, 3.0), (-3.0, 3.0), (-10.0, 10.0)),
                 search_dims=(7, 7, 3)):
        x_space = np.linspace(search_space[0][0], search_space[0][1], search_dims[0])
        y_space = np.linspace(search_space[1][0], search_space[1][1], search_dims[1])
        a_space = np.linspace(search_space[2][0], search_space[2][1], search_dims[2])
        X, Y, A = np.meshgrid(x_space, y_space, a_space)
        self.search_grid = np.array([X.flatten(), Y.flatten(), A.flatten()]).T
        self.reset()

    def reset(self):
        return

    def sample(self, n=0):
        return self.search_grid


class ParticleFiltering(SearchSpace):
    def __init__(self, bnd=(1, 1, 10)):
        self.bnd = list(bnd)
        self.reset()

    def sample(self, n=10):
        samples = []
        for _ in range(n):
            if len(self.data) > 0:
                i_mean = np.random.choice(
                    list(range(len(self.data))),
                    p=self.score / np.linalg.norm(self.score, ord=1),
                )
                sample = np.random.multivariate_normal(
                    mean=self.data[i_mean], cov=np.diag(np.array(self.bnd))
                )
            else:
                sample = np.random.multivariate_normal(
                    mean=np.zeros(len(self.bnd)), cov=np.diag(np.array(self.bnd) * 3)
                )
            samples.append(sample)
        return np.array(samples)

    def addData(self, data, score):
        score = score.clip(min=1e-5)
        self.data = data
        self.score = score

    def reset(self):
        self.data = np.zeros((0, len(self.bnd)))
        self.score = np.ones(0)


class KalmanFiltering(SearchSpace):
    """Gaussian offset sampler; used by siamese training (sampler.py:50-56)."""

    def __init__(self, bnd=(1, 1, 10)):
        self.bnd = list(bnd)
        self.reset()

    def sample(self, n=10):
        return np.random.multivariate_normal(self.mean, self.cov, size=n)

    def addData(self, data, score):
        score = score.clip(min=1e-5)
        self.data = np.concatenate((self.data, data))
        self.score = np.concatenate((self.score, score))
        self.mean = np.average(self.data, weights=self.score, axis=0)
        self.cov = np.cov(self.data.T, ddof=0, aweights=self.score)

    def reset(self):
        self.mean = np.zeros(len(self.bnd))
        self.cov = np.diag(self.bnd)
        self.data = np.zeros((0, len(self.bnd)))
        self.score = np.array([])


class GaussianMixtureModel(ParticleFiltering):
    """Pomegranate-free stand-in: behaves as a particle filter."""
