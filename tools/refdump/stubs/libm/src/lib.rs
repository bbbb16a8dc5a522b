//! Minimal offline stand-in for the `libm` crate: only the three functions
//! the reference S2 library uses (`ilogb`, `ldexp`, `remquo`).

/// Exponent of x as in C ilogb. Matches C99 semantics for the inputs the
/// reference uses (finite nonzero values); handles subnormals, 0, inf, nan.
pub fn ilogb(x: f64) -> i32 {
    const FP_ILOGB0: i32 = i32::MIN;
    const FP_ILOGBNAN: i32 = i32::MAX;
    let bits = x.to_bits();
    let exp = ((bits >> 52) & 0x7ff) as i32;
    let frac = bits & 0xf_ffff_ffff_ffff;
    if exp == 0 {
        if frac == 0 {
            return FP_ILOGB0;
        }
        // subnormal: normalize
        return -1023 - (frac.leading_zeros() as i32 - 11);
    }
    if exp == 0x7ff {
        return if frac == 0 { i32::MAX } else { FP_ILOGBNAN };
    }
    exp - 1023
}

/// x * 2^n with correct overflow/underflow behavior (C ldexp / scalbn).
pub fn ldexp(x: f64, n: i32) -> f64 {
    let mut y = x;
    let mut n = n;
    if n > 1023 {
        y *= f64::from_bits(0x7fe0_0000_0000_0000); // 2^1023
        n -= 1023;
        if n > 1023 {
            y *= f64::from_bits(0x7fe0_0000_0000_0000);
            n -= 1023;
            if n > 1023 {
                n = 1023;
            }
        }
    } else if n < -1022 {
        // scale up by 2^53 alongside to keep precision for subnormal results
        let scale = f64::from_bits(0x0010_0000_0000_0000) * f64::from_bits(0x4340_0000_0000_0000); // 2^-1022 * 2^53
        y *= scale;
        n += 1022 - 53;
        if n < -1022 {
            y *= scale;
            n += 1022 - 53;
            if n < -1022 {
                n = -1022;
            }
        }
    }
    y * f64::from_bits(((0x3ff + n as i64) as u64) << 52)
}

/// IEEE-754 remainder plus low quotient bits (C remquo).
///
/// Exact: uses hardware fmod (`%`, exact per IEEE-754) against 2|y|, then
/// folds into (-|y|/2, |y|/2] with ties-to-even. All corrections are exact
/// by Sterbenz's lemma. The quotient's low bits are returned best-effort
/// (the reference only consumes the remainder).
pub fn remquo(x: f64, y: f64) -> (f64, i32) {
    if y == 0.0 || x.is_infinite() || x.is_nan() || y.is_nan() {
        return (f64::NAN, 0);
    }
    let ya = y.abs();
    // r2 in (-2|y|, 2|y|), sign of x, exact.
    let y2 = 2.0 * ya;
    let (mut r, mut q): (f64, i64);
    if y2.is_infinite() {
        // 2|y| overflows: fmod by |y| then single fold (tie parity cannot
        // matter because |x/y| < 2 here for finite fold cases).
        r = x % ya;
        q = 0;
        let a = r.abs();
        if a > 0.5 * ya {
            r -= ya.copysign(r);
            q += 1;
        }
        return (r, (q as i32) * if (x < 0.0) != (y < 0.0) { -1 } else { 1 });
    }
    let r2 = x % y2;
    let a = r2.abs();
    let s = if r2 < 0.0 { -1.0 } else { 1.0 };
    let half = 0.5 * ya;
    if a <= half {
        // quotient contribution even; tie keeps r2 (round to even)
        r = r2;
        q = 0;
    } else if a < 1.5 * ya {
        r = r2 - s * ya;
        q = 1;
        // tie at exactly half after fold: a == 1.5*ya handled below
    } else {
        // a >= 1.5*ya: round to even quotient (2)
        r = r2 - s * y2;
        q = 2;
    }
    let sign_q = if (x < 0.0) != (y < 0.0) { -1 } else { 1 };
    (r, (q as i32) * sign_q)
}

#[cfg(test)]
mod tests {
    use super::*;

    #[test]
    fn remquo_matches_remainder_semantics() {
        let cases = [
            (5.0, 2.0, 1.0),
            (6.0, 2.0, 0.0),
            (7.0, 2.0, -1.0),
            (3.0, 2.0, -1.0), // tie: quotient 1.5 -> 2 (even), rem -1
            (5.0, 2.0, 1.0),
            (-3.0, 2.0, 1.0),
            (2.5, 1.0, 0.5),  // tie: 2.5 -> q=2 rem 0.5
            (3.5, 1.0, -0.5), // tie: 3.5 -> q=4 rem -0.5
        ];
        for (x, y, want) in cases {
            let (r, _) = remquo(x, y);
            assert_eq!(r, want, "remquo({x},{y})");
        }
    }

    #[test]
    fn ilogb_ldexp_roundtrip() {
        assert_eq!(ilogb(1.0), 0);
        assert_eq!(ilogb(0.75), -1);
        assert_eq!(ilogb(1024.0), 10);
        assert_eq!(ldexp(1.0, -60), 2f64.powi(-60));
        assert_eq!(ldexp(1.5, 3), 12.0);
    }
}
