package graft.index;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorMask;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD leaf-scan kernels for the packed point tree ({@link PointRTree2D}),
 * written against the JDK Vector API (JEP 417/426 -- {@code
 * jdk.incubator.vector}, JDK 17+). Java, not Scala, because javac resolves
 * incubator modules directly with {@code --add-modules}; callers go through
 * {@code graft.index.Simd}, which probes availability once and falls back
 * to the scalar loops when the module is absent from the running JVM (e.g.
 * a spark-submit without the flag) -- so these kernels are a pure
 * acceleration layer, never a correctness dependency.
 *
 * The kernels cover the two flat-array scans that dominate per-core probe
 * cost after envelope rejection (reference yardstick:
 * rstar/README.md:29-39 locate_at_point 0.18 us):
 * equality location and best-distance leaf scans over the STR-ordered
 * coordinate columns.
 */
public final class VectorKernels {
    private VectorKernels() {}

    private static final VectorSpecies<Double> S = DoubleVector.SPECIES_PREFERRED;

    /** First index in [from, to) with xs[i] == px && ys[i] == py, or -1. */
    public static int findEq(double[] xs, double[] ys, int from, int to,
            double px, double py) {
        int i = from;
        int bound = from + S.loopBound(to - from);
        for (; i < bound; i += S.length()) {
            VectorMask<Double> m = DoubleVector.fromArray(S, xs, i).eq(px)
                .and(DoubleVector.fromArray(S, ys, i).eq(py));
            if (m.anyTrue()) return i + m.firstTrue();
        }
        for (; i < to; i++) {
            if (xs[i] == px && ys[i] == py) return i;
        }
        return -1;
    }

    /**
     * Best (minimum) squared distance to (px, py) over [from, to), with the
     * tree's deterministic tie rule (smaller point id wins at float-equal
     * distance). Returns the winning index, or -1 when the range is empty;
     * writes the winning distance into dOut[0]. The caller merges against
     * its running best.
     */
    public static int nearestInRange(double[] xs, double[] ys, long[] ids,
            int from, int to, double px, double py, double[] dOut) {
        int i = from;
        int best = -1;
        double bestD = Double.MAX_VALUE;
        int bound = from + S.loopBound(to - from);
        for (; i < bound; i += S.length()) {
            DoubleVector dx = DoubleVector.fromArray(S, xs, i).sub(px);
            DoubleVector dy = DoubleVector.fromArray(S, ys, i).sub(py);
            DoubleVector d2 = dx.mul(dx).add(dy.mul(dy));
            double lane = d2.reduceLanes(jdk.incubator.vector.VectorOperators.MIN);
            // reduceLanes(MIN) propagates NaN, and `NaN < bestD` is false:
            // without the isNaN check a block containing ONE non-finite
            // coordinate would be skipped entirely while the scalar tail
            // still considers its finite points. The scalar rescan's
            // comparisons are NaN-false, so non-finite points never win
            // there, matching the scalar path exactly.
            if (lane < bestD || Double.isNaN(lane)) {
                // a strictly better lane exists: locate it scalar (rare path)
                for (int j = i; j < i + S.length(); j++) {
                    double ddx = xs[j] - px, ddy = ys[j] - py;
                    double d = ddx * ddx + ddy * ddy;
                    if (d < bestD || (d == bestD && best >= 0 && ids[j] < ids[best])) {
                        bestD = d; best = j;
                    }
                }
            } else if (lane == bestD && best >= 0) {
                // equal-distance lane: the id tiebreak may still prefer it
                for (int j = i; j < i + S.length(); j++) {
                    double ddx = xs[j] - px, ddy = ys[j] - py;
                    double d = ddx * ddx + ddy * ddy;
                    if (d == bestD && ids[j] < ids[best]) { best = j; }
                }
            }
        }
        for (; i < to; i++) {
            double dx = xs[i] - px, dy = ys[i] - py;
            double d = dx * dx + dy * dy;
            if (d < bestD || (d == bestD && best >= 0 && ids[i] < ids[best])) {
                bestD = d; best = i;
            }
        }
        dOut[0] = bestD;
        return best;
    }

    /** Availability self-test: exercises a real vector op so class-loading
     *  or linkage failures surface HERE, inside the caller's try block. */
    public static boolean selfTest() {
        double[] xs = {1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0};
        double[] ys = {9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0};
        long[] ids = {0, 1, 2, 3, 4, 5, 6, 7, 8};
        if (findEq(xs, ys, 0, xs.length, 7.0, 3.0) != 6) return false;
        if (findEq(xs, ys, 0, xs.length, 7.0, 4.0) != -1) return false;
        double[] d = new double[1];
        int b = nearestInRange(xs, ys, ids, 0, xs.length, 5.1, 4.9, d);
        return b == 4 && d[0] == (5.0 - 5.1) * (5.0 - 5.1) + (5.0 - 4.9) * (5.0 - 4.9);
    }
}
