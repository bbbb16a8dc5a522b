//! Minimal offline stand-in for `cgmath`: just the Vector3/Matrix3 surface
//! the reference S2 library touches (column-major, like the real crate).

#[derive(Clone, Copy, Debug, PartialEq)]
pub struct Vector3<S> {
    pub x: S,
    pub y: S,
    pub z: S,
}

impl<S> Vector3<S> {
    pub fn new(x: S, y: S, z: S) -> Self {
        Vector3 { x, y, z }
    }
}

/// Column-major 3x3 matrix; fields are the columns, as in the real cgmath.
#[derive(Clone, Copy, Debug, PartialEq)]
pub struct Matrix3<S> {
    pub x: Vector3<S>,
    pub y: Vector3<S>,
    pub z: Vector3<S>,
}

impl Matrix3<f64> {
    pub fn from_cols(x: Vector3<f64>, y: Vector3<f64>, z: Vector3<f64>) -> Self {
        Matrix3 { x, y, z }
    }
}

pub trait Matrix {
    fn transpose(&self) -> Self;
}

pub trait SquareMatrix {
    fn identity() -> Self;
}

impl Matrix for Matrix3<f64> {
    fn transpose(&self) -> Self {
        Matrix3 {
            x: Vector3::new(self.x.x, self.y.x, self.z.x),
            y: Vector3::new(self.x.y, self.y.y, self.z.y),
            z: Vector3::new(self.x.z, self.y.z, self.z.z),
        }
    }
}

impl SquareMatrix for Matrix3<f64> {
    fn identity() -> Self {
        Matrix3::from_cols(
            Vector3::new(1.0, 0.0, 0.0),
            Vector3::new(0.0, 1.0, 0.0),
            Vector3::new(0.0, 0.0, 1.0),
        )
    }
}

fn mat_mul_vec(m: &Matrix3<f64>, v: Vector3<f64>) -> Vector3<f64> {
    Vector3::new(
        m.x.x * v.x + m.y.x * v.y + m.z.x * v.z,
        m.x.y * v.x + m.y.y * v.y + m.z.y * v.z,
        m.x.z * v.x + m.y.z * v.y + m.z.z * v.z,
    )
}

impl std::ops::Mul<Vector3<f64>> for Matrix3<f64> {
    type Output = Vector3<f64>;
    fn mul(self, v: Vector3<f64>) -> Vector3<f64> {
        mat_mul_vec(&self, v)
    }
}

impl<'a> std::ops::Mul<Vector3<f64>> for &'a Matrix3<f64> {
    type Output = Vector3<f64>;
    fn mul(self, v: Vector3<f64>) -> Vector3<f64> {
        mat_mul_vec(self, v)
    }
}
