//! Minimal offline stand-in for `bigdecimal`, used only to compile the
//! reference S2 library's `PreciseVector` (r3/precisevector.rs), which
//! constructs values exclusively from f64/i64 and uses +, -, *, abs and
//! comparisons. Every f64 and every product/sum of f64s is an exact binary
//! rational, so an arbitrary-precision *binary* fixed-point number
//! (magnitude limbs * 2^exp) gives bit-identical semantics for that usage
//! without implementing decimal arithmetic. `from_str` supports integers
//! only (the reference never calls it outside tests).

use std::cmp::Ordering;
use std::str::FromStr;

/// Arbitrary-precision signed binary fixed-point: (-1)^neg * mag * 2^exp,
/// with `mag` little-endian u64 limbs. Canonical form: zero => mag empty,
/// neg false, exp 0; nonzero => lowest limb odd (exp absorbs trailing
/// zero bits) and no high zero limbs.
#[derive(Clone, Debug)]
pub struct BigDecimal {
    neg: bool,
    exp: i64,
    mag: Vec<u64>,
}

fn trim(mag: &mut Vec<u64>) {
    while mag.last() == Some(&0) {
        mag.pop();
    }
}

fn mag_cmp(a: &[u64], b: &[u64]) -> Ordering {
    if a.len() != b.len() {
        return a.len().cmp(&b.len());
    }
    for i in (0..a.len()).rev() {
        if a[i] != b[i] {
            return a[i].cmp(&b[i]);
        }
    }
    Ordering::Equal
}

fn mag_add(a: &[u64], b: &[u64]) -> Vec<u64> {
    let mut out = Vec::with_capacity(a.len().max(b.len()) + 1);
    let mut carry = 0u64;
    for i in 0..a.len().max(b.len()) {
        let x = *a.get(i).unwrap_or(&0) as u128;
        let y = *b.get(i).unwrap_or(&0) as u128;
        let s = x + y + carry as u128;
        out.push(s as u64);
        carry = (s >> 64) as u64;
    }
    if carry != 0 {
        out.push(carry);
    }
    out
}

/// a - b, requires a >= b.
fn mag_sub(a: &[u64], b: &[u64]) -> Vec<u64> {
    let mut out = Vec::with_capacity(a.len());
    let mut borrow = 0i128;
    for i in 0..a.len() {
        let x = a[i] as i128;
        let y = *b.get(i).unwrap_or(&0) as i128;
        let mut d = x - y - borrow;
        if d < 0 {
            d += 1i128 << 64;
            borrow = 1;
        } else {
            borrow = 0;
        }
        out.push(d as u64);
    }
    debug_assert_eq!(borrow, 0);
    trim(&mut out);
    out
}

fn mag_mul(a: &[u64], b: &[u64]) -> Vec<u64> {
    if a.is_empty() || b.is_empty() {
        return Vec::new();
    }
    let mut out = vec![0u64; a.len() + b.len()];
    for (i, &x) in a.iter().enumerate() {
        let mut carry = 0u128;
        for (j, &y) in b.iter().enumerate() {
            let cur = out[i + j] as u128 + x as u128 * y as u128 + carry;
            out[i + j] = cur as u64;
            carry = cur >> 64;
        }
        let mut k = i + b.len();
        while carry != 0 {
            let cur = out[k] as u128 + carry;
            out[k] = cur as u64;
            carry = cur >> 64;
            k += 1;
        }
    }
    trim(&mut out);
    out
}

fn mag_shl(a: &[u64], bits: u64) -> Vec<u64> {
    if a.is_empty() {
        return Vec::new();
    }
    let limbs = (bits / 64) as usize;
    let rem = (bits % 64) as u32;
    let mut out = vec![0u64; limbs];
    if rem == 0 {
        out.extend_from_slice(a);
    } else {
        let mut carry = 0u64;
        for &x in a {
            out.push((x << rem) | carry);
            carry = x >> (64 - rem);
        }
        if carry != 0 {
            out.push(carry);
        }
    }
    out
}

impl BigDecimal {
    fn zero() -> Self {
        BigDecimal { neg: false, exp: 0, mag: Vec::new() }
    }

    fn canon(mut self) -> Self {
        trim(&mut self.mag);
        if self.mag.is_empty() {
            return Self::zero();
        }
        // absorb trailing zero bits into exp
        let tz: u64 = {
            let mut t = 0u64;
            for &l in &self.mag {
                if l == 0 {
                    t += 64;
                } else {
                    t += l.trailing_zeros() as u64;
                    break;
                }
            }
            t
        };
        if tz > 0 {
            let limbs = (tz / 64) as usize;
            let rem = (tz % 64) as u32;
            self.mag.drain(..limbs);
            if rem > 0 {
                let n = self.mag.len();
                for i in 0..n {
                    let hi = if i + 1 < n { self.mag[i + 1] } else { 0 };
                    self.mag[i] = (self.mag[i] >> rem) | (hi << (64 - rem));
                }
                trim(&mut self.mag);
            }
            self.exp += tz as i64;
        }
        self
    }

    fn from_parts(neg: bool, mag: Vec<u64>, exp: i64) -> Self {
        BigDecimal { neg, exp, mag }.canon()
    }

    pub fn abs(&self) -> BigDecimal {
        BigDecimal { neg: false, ..self.clone() }
    }

    pub fn is_zero(&self) -> bool {
        self.mag.is_empty()
    }

    fn add_signed(a: &BigDecimal, b: &BigDecimal, flip_b: bool) -> BigDecimal {
        if a.is_zero() {
            let mut r = b.clone();
            if flip_b && !r.is_zero() {
                r.neg = !r.neg;
            }
            return r;
        }
        if b.is_zero() {
            return a.clone();
        }
        let b_neg = b.neg ^ flip_b;
        // align exponents
        let exp = a.exp.min(b.exp);
        let am = mag_shl(&a.mag, (a.exp - exp) as u64);
        let bm = mag_shl(&b.mag, (b.exp - exp) as u64);
        if a.neg == b_neg {
            BigDecimal::from_parts(a.neg, mag_add(&am, &bm), exp)
        } else {
            match mag_cmp(&am, &bm) {
                Ordering::Equal => BigDecimal::zero(),
                Ordering::Greater => BigDecimal::from_parts(a.neg, mag_sub(&am, &bm), exp),
                Ordering::Less => BigDecimal::from_parts(b_neg, mag_sub(&bm, &am), exp),
            }
        }
    }

    fn mul_impl(a: &BigDecimal, b: &BigDecimal) -> BigDecimal {
        if a.is_zero() || b.is_zero() {
            return BigDecimal::zero();
        }
        BigDecimal::from_parts(a.neg ^ b.neg, mag_mul(&a.mag, &b.mag), a.exp + b.exp)
    }

    fn to_f64_impl(&self) -> f64 {
        if self.is_zero() {
            return 0.0;
        }
        // take top 128 bits of the magnitude for the mantissa
        let nbits = (self.mag.len() as i64) * 64
            - self.mag.last().unwrap().leading_zeros() as i64;
        let mut val = 0.0f64;
        // accumulate from most significant limb down; stops mattering
        // after ~2 limbs but this is not hot code
        for (i, &l) in self.mag.iter().enumerate().rev() {
            val += (l as f64) * pow2((i as i64) * 64 + self.exp);
        }
        let _ = nbits;
        if self.neg {
            -val
        } else {
            val
        }
    }
}

fn pow2(e: i64) -> f64 {
    if e >= -1022 && e <= 1023 {
        f64::from_bits(((1023 + e) as u64) << 52)
    } else if e < -1022 {
        if e < -1200 {
            0.0
        } else {
            f64::from_bits(1u64) * pow2(e + 1074)
        }
    } else if e > 1200 {
        f64::INFINITY
    } else {
        f64::from_bits(((1023 + 1023) as u64) << 52) * pow2(e - 1023)
    }
}

impl PartialEq for BigDecimal {
    fn eq(&self, other: &Self) -> bool {
        // canonical form makes structural equality correct
        self.neg == other.neg && self.exp == other.exp && self.mag == other.mag
    }
}
impl Eq for BigDecimal {}

impl PartialOrd for BigDecimal {
    fn partial_cmp(&self, other: &Self) -> Option<Ordering> {
        Some(self.cmp(other))
    }
}

impl Ord for BigDecimal {
    fn cmp(&self, other: &Self) -> Ordering {
        let d = BigDecimal::add_signed(self, other, true);
        if d.is_zero() {
            Ordering::Equal
        } else if d.neg {
            Ordering::Less
        } else {
            Ordering::Greater
        }
    }
}

impl From<i64> for BigDecimal {
    fn from(i: i64) -> Self {
        let neg = i < 0;
        let mag = (i.unsigned_abs()) as u64;
        BigDecimal::from_parts(neg, vec![mag], 0)
    }
}

pub trait FromPrimitive: Sized {
    fn from_f64(f: f64) -> Option<Self>;
    fn from_i64(i: i64) -> Option<Self>;
}

pub trait ToPrimitive {
    fn to_f64(&self) -> Option<f64>;
}

impl FromPrimitive for BigDecimal {
    fn from_f64(f: f64) -> Option<Self> {
        if !f.is_finite() {
            return None;
        }
        if f == 0.0 {
            return Some(BigDecimal::zero());
        }
        let bits = f.to_bits();
        let neg = bits >> 63 == 1;
        let biased = ((bits >> 52) & 0x7ff) as i64;
        let frac = bits & 0xf_ffff_ffff_ffff;
        let (mant, exp) = if biased == 0 {
            (frac, -1074i64) // subnormal
        } else {
            (frac | (1u64 << 52), biased - 1075)
        };
        Some(BigDecimal::from_parts(neg, vec![mant], exp))
    }

    fn from_i64(i: i64) -> Option<Self> {
        Some(BigDecimal::from(i))
    }
}

impl ToPrimitive for BigDecimal {
    fn to_f64(&self) -> Option<f64> {
        Some(self.to_f64_impl())
    }
}

#[derive(Debug)]
pub struct ParseBigDecimalError;

impl std::fmt::Display for ParseBigDecimalError {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "invalid BigDecimal (stub parses integers only)")
    }
}
impl std::error::Error for ParseBigDecimalError {}

impl FromStr for BigDecimal {
    type Err = ParseBigDecimalError;
    /// Integer strings only — sufficient for the reference, which never
    /// parses decimals outside its test modules.
    fn from_str(s: &str) -> Result<Self, Self::Err> {
        let s = s.trim();
        let (neg, digits) = match s.strip_prefix('-') {
            Some(d) => (true, d),
            None => (false, s),
        };
        if digits.is_empty() || !digits.bytes().all(|b| b.is_ascii_digit()) {
            return Err(ParseBigDecimalError);
        }
        let mut mag: Vec<u64> = Vec::new();
        for b in digits.bytes() {
            // mag = mag * 10 + d
            mag = mag_add(&mag_mul(&mag, &[10]), &[(b - b'0') as u64]);
        }
        Ok(BigDecimal::from_parts(neg, mag, 0))
    }
}

macro_rules! impl_binop {
    ($trait:ident, $method:ident, $impl_fn:expr) => {
        impl std::ops::$trait<BigDecimal> for BigDecimal {
            type Output = BigDecimal;
            fn $method(self, rhs: BigDecimal) -> BigDecimal {
                $impl_fn(&self, &rhs)
            }
        }
        impl<'a> std::ops::$trait<&'a BigDecimal> for BigDecimal {
            type Output = BigDecimal;
            fn $method(self, rhs: &'a BigDecimal) -> BigDecimal {
                $impl_fn(&self, rhs)
            }
        }
        impl<'a> std::ops::$trait<BigDecimal> for &'a BigDecimal {
            type Output = BigDecimal;
            fn $method(self, rhs: BigDecimal) -> BigDecimal {
                $impl_fn(self, &rhs)
            }
        }
        impl<'a, 'b> std::ops::$trait<&'b BigDecimal> for &'a BigDecimal {
            type Output = BigDecimal;
            fn $method(self, rhs: &'b BigDecimal) -> BigDecimal {
                $impl_fn(self, rhs)
            }
        }
    };
}

impl_binop!(Add, add, |a, b| BigDecimal::add_signed(a, b, false));
impl_binop!(Sub, sub, |a, b| BigDecimal::add_signed(a, b, true));
impl_binop!(Mul, mul, BigDecimal::mul_impl);

impl std::ops::Neg for BigDecimal {
    type Output = BigDecimal;
    fn neg(self) -> BigDecimal {
        if self.is_zero() {
            self
        } else {
            BigDecimal { neg: !self.neg, ..self }
        }
    }
}

#[cfg(test)]
mod tests {
    use super::*;

    #[test]
    fn exact_float_roundtrip() {
        for v in [0.0, 1.0, -1.5, 0.1, 1e300, 5e-324, -2.2250738585072014e-308] {
            let b = BigDecimal::from_f64(v).unwrap();
            assert_eq!(b.to_f64().unwrap(), v, "{v}");
        }
    }

    #[test]
    fn arithmetic() {
        let a = BigDecimal::from_f64(0.1).unwrap();
        let b = BigDecimal::from_f64(0.2).unwrap();
        let c = &a + &b;
        // exact binary sum of the two representable values, NOT 0.3
        assert!(c > BigDecimal::from_f64(0.3).unwrap());
        assert_eq!(&a * BigDecimal::from(10), BigDecimal::from(1) * &a * BigDecimal::from(10));
        assert_eq!((&b - &a).to_f64().unwrap(), 0.2 - 0.1);
        assert!(BigDecimal::from(-3) < BigDecimal::from(2));
        assert_eq!("12345678901234567890123".parse::<BigDecimal>().unwrap()
            - "12345678901234567890122".parse::<BigDecimal>().unwrap(),
            BigDecimal::from(1));
    }
}
